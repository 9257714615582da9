"""Cached-history Miner train step at B=64 (roberta-base towers, one chip).

The B=16 bench geometry leaves only B*C=80 candidate sequences in the step
once history comes from the cache; B=64 is the production batch the
at-scale runs use. Thin wrapper over bench.bench_miner_train_cached_his
(the canonical implementation — mirrors trainer._make_cached_his_train_step).

Measured 2026-08-17 (one v5e chip): 290.8 ex/s at 220 ms/step = ~122
TFLOP/s = 62% of bf16 peak with no remat (vs 270 ex/s at B=16) — the
cached step is compute-bound at good MFU, not batch-starved.
"""
import sys

sys.path.insert(0, ".")

import jax


def main():
    if jax.default_backend() not in ("cpu", "gpu"):
        jax.config.update("jax_default_prng_impl", "rbg")
    from miner_tpu.config import configure_compilation_cache

    configure_compilation_cache()
    import bench

    steady, amortized, refresh = bench.bench_miner_train_cached_his(B=64)
    print(f"B=64 cached-his: {steady:.1f} ex/s steady, "
          f"{amortized:.1f} ex/s amortized(K=500), refresh {refresh:.2f}s")


if __name__ == "__main__":
    main()
