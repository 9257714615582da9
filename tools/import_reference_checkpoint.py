"""Import a reference (MrRobot2211/miner) trained checkpoint into miner_tpu.

The reference pickles whole nn.Modules: ``torch.save({'model': <Miner>,
'optimizer': ..., 'scheduler': ...}, 'bestAucModel.pt')`` (reference:
src/base_trainer.py:204-221). Unpickling therefore needs the reference
package importable. This tool loads such a file (or a bare ``state_dict``
.pth), converts every tensor onto miner_tpu's ``Miner`` parameter layout
(miner_tpu.models.hf_import.convert_miner_state_dict), and writes an orbax
checkpoint that ``--pretrained_model_path`` / ``--saved_model_path`` accept —
so a user of the reference can switch frameworks and keep their trained
models.

Usage:
    python tools/import_reference_checkpoint.py \
        --torch_ckpt /path/to/bestAucModel.pt \
        --reference_repo /path/to/reference \
        --num_layers 12 \
        --out converted/bestAucModel
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._env import honor_env_platform

honor_env_platform()


def load_torch_state_dict(path: str, reference_repo: str | None):
    import torch

    if reference_repo:
        sys.path.insert(0, reference_repo)
    try:
        payload = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as e:
        raise SystemExit(
            f"could not unpickle {path}: {e}\n"
            "whole-module reference checkpoints need --reference_repo "
            "pointing at the reference source tree"
        )
    if isinstance(payload, dict) and "model" in payload and hasattr(
        payload["model"], "state_dict"
    ):
        return payload["model"].state_dict()
    if isinstance(payload, dict):
        return payload  # bare state_dict
    if hasattr(payload, "state_dict"):
        return payload.state_dict()
    raise SystemExit(f"unrecognized checkpoint payload type {type(payload)!r}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--reference_repo", default=None,
                    help="reference source tree for unpickling whole modules")
    ap.add_argument("--num_layers", type=int, default=12,
                    help="PLM tower depth in the checkpoint")
    ap.add_argument("--model_name", default="miner",
                    choices=["miner", "fastformer", "unbert", "unisrec"],
                    help="which reference model class the checkpoint holds")
    ap.add_argument("--legacy_history_layout", action="store_true",
                    help="acknowledge the converted model will run with "
                         "--legacy_history_layout (the reference's "
                         "pads-first rows) — required for the "
                         "position-sensitive models")
    ap.add_argument("--force_layout_mismatch", action="store_true",
                    help="transfer a position-sensitive model anyway; it "
                         "will see a shifted input distribution under the "
                         "default clicks-first layout")
    ap.add_argument("--out", required=True,
                    help="output checkpoint path (orbax dir); pass it to "
                         "--pretrained_model_path / --saved_model_path")
    args = ap.parse_args()

    import numpy as np

    from miner_tpu.models import hf_import
    from miner_tpu.training.checkpoint import CheckpointManager

    hf_import.check_history_layout_for_transfer(
        args.model_name, args.legacy_history_layout,
        force=args.force_layout_mismatch)

    sd = load_torch_state_dict(args.torch_ckpt, args.reference_repo)
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    if args.model_name == "miner":
        params = hf_import.convert_miner_state_dict(sd, num_layers=args.num_layers)
    elif args.model_name == "fastformer":
        params = hf_import.convert_fastformer_state_dict(
            sd, num_layers=args.num_layers)
    elif args.model_name == "unbert":
        params = hf_import.convert_unbert_state_dict(sd)
    else:
        params = hf_import.convert_unisrec_model_state_dict(
            sd, num_layers=args.num_layers)
    n = len([1 for _ in _iter_leaves(params)])
    print(f"converted {n} tensors")

    import os

    ckpt = CheckpointManager(os.path.dirname(args.out) or ".")
    ckpt.save(os.path.basename(args.out), {"params": params})
    ckpt.wait()
    print(f"wrote {args.out}")


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
