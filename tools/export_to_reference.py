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

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS"):
    # The axon sitecustomize force-registers the TPU backend and overrides
    # jax_platforms programmatically; orbax's checkpointer calls
    # jax.default_backend(), which would then initialize the (slow) TPU
    # tunnel even for this pure-host conversion. Honor the env var.
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir written by the trainer")
    ap.add_argument("--plm_name", default="roberta",
                    choices=["roberta", "bert"],
                    help="attribute name the reference NewsEncoder uses for "
                         "the tower (roberta for RoBERTa configs, bert for "
                         "BERT ones)")
    ap.add_argument("--out", required=True, help="output .pt path")
    args = ap.parse_args()

    import torch

    from miner_tpu.models.hf_import import export_miner_state_dict
    from miner_tpu.training.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.dirname(args.ckpt) or ".")
    payload = ckpt.restore(os.path.basename(args.ckpt))
    params = payload["params"] if "params" in payload else payload
    sd = export_miner_state_dict(params, plm_name=args.plm_name)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
