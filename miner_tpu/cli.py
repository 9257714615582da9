"""CLI entry point: the reference's subcommand surface on the TPU trainer.

``python -m miner_tpu <train|train_fastformer|eval|eval_fastformer|pretrain>
@config/file.txt`` (reference: main.py:33-64), plus two serving subcommands
with no reference counterpart: ``recommend`` (one-shot ranking) and
``serve`` (HTTP scoring server over the news-embedding cache).
"""
from __future__ import annotations

import sys

from miner_tpu.config import make_parser


def main(argv=None):
    parser = make_parser()
    args = parser.parse_args(argv)
    if args.mode is None:
        parser.print_help()
        return 1

    import os

    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even where a sitecustomize registers a TPU
        # plugin and overrides jax_platforms programmatically
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from miner_tpu.config import configure_compilation_cache
    from miner_tpu.parallel.mesh import maybe_initialize_distributed
    from miner_tpu.training.trainer import Trainer

    configure_compilation_cache(getattr(args, "compilation_cache_dir", None))
    maybe_initialize_distributed()

    if args.mode in ("train", "train_fastformer"):
        Trainer(args).train()
    elif args.mode == "pretrain":
        args.model_name = "pretrain"
        Trainer(args).train()
    elif args.mode in ("eval", "eval_fastformer"):
        Trainer(args).eval()
    elif args.mode == "recommend":
        Trainer(args).recommend()
    elif args.mode == "serve":
        from miner_tpu.serving import serve

        serve(Trainer(args), args.host, args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
