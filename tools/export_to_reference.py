"""Export a miner_tpu checkpoint to the reference (MrRobot2211/miner) format.

The inverse of tools/import_reference_checkpoint.py: loads an orbax
checkpoint written by the trainer (``bestAucModel`` / ``finalModel``),
converts the ``Miner`` parameter tree to a reference-format torch
``state_dict`` (miner_tpu.models.hf_import.export_miner_state_dict), and
``torch.save``s it. The reference loads it with
``model.load_state_dict(torch.load(f), strict=False)`` (strict=False
regenerates the non-trainable buffers the dict does not carry, e.g.
``position_ids``; reference: src/model/model.py:13-138) — so a model
trained here transfers back to a reference deployment.

Usage:
    python tools/export_to_reference.py \
        --ckpt /path/to/run/ckpt/bestAucModel \
        --plm_name roberta \
        --out exported_state_dict.pt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._env import honor_env_platform

honor_env_platform()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir written by the trainer")
    ap.add_argument("--plm_name", default="roberta",
                    choices=["roberta", "bert"],
                    help="attribute name the reference NewsEncoder uses for "
                         "the tower (roberta for RoBERTa configs, bert for "
                         "BERT ones)")
    ap.add_argument("--model_name", default="miner",
                    choices=["miner", "fastformer", "unbert", "unisrec"],
                    help="which reference model class to export for")
    ap.add_argument("--legacy_history_layout", action="store_true",
                    help="acknowledge the exported model was trained with "
                         "--legacy_history_layout (the reference's "
                         "pads-first rows) — required for the "
                         "position-sensitive models")
    ap.add_argument("--force_layout_mismatch", action="store_true",
                    help="export a position-sensitive model anyway; in the "
                         "reference it will see pads-first rows it was not "
                         "trained on")
    ap.add_argument("--out", required=True, help="output .pt path")
    args = ap.parse_args()

    import torch

    from miner_tpu.models import hf_import
    from miner_tpu.training.checkpoint import CheckpointManager

    hf_import.check_history_layout_for_transfer(
        args.model_name, args.legacy_history_layout,
        force=args.force_layout_mismatch)

    ckpt_path = os.path.normpath(args.ckpt)  # tolerate a trailing slash
    ckpt = CheckpointManager(os.path.dirname(ckpt_path) or ".")
    payload = ckpt.restore(os.path.basename(ckpt_path))
    params = payload["params"] if "params" in payload else payload
    if args.model_name == "miner":
        sd = hf_import.export_miner_state_dict(params, plm_name=args.plm_name)
    elif args.model_name == "fastformer":
        sd = hf_import.export_fastformer_state_dict(
            params, plm_name=args.plm_name)
    elif args.model_name == "unbert":
        sd = hf_import.export_unbert_state_dict(params)
    else:
        sd = hf_import.export_unisrec_state_dict(
            params, plm_name=args.plm_name,
            history_layout="legacy" if args.legacy_history_layout
            else "clicks_first")

    import numpy as np

    def to_torch(v):
        try:
            return torch.from_numpy(v.copy())
        except TypeError:
            # --param_dtype bfloat16 checkpoints restore as ml_dtypes
            # arrays torch cannot consume; the reference models are f32
            return torch.from_numpy(np.asarray(v, np.float32))

    torch.save({k: to_torch(v) for k, v in sd.items()}, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
