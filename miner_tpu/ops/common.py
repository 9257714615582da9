"""Shared helpers for the Pallas kernel layer."""
from __future__ import annotations

import os

import jax


def force_interpret() -> bool:
    """True when ``MINER_TPU_FORCE_INTERPRET=1``: every Pallas kernel runs in
    interpret mode regardless of backend, and ``on_tpu`` reports the kernels
    as available. Lets the virtual-CPU-mesh driver dryrun certify the fused
    multi-chip path (shard_map + custom_vjp kernel wrappers) without TPU
    hardware. Read at trace time — set the env var before tracing."""
    return os.environ.get("MINER_TPU_FORCE_INTERPRET", "") == "1"


def on_tpu() -> bool:
    return force_interpret() or jax.default_backend() in ("tpu", "axon")


def pick_block(b: int, preferred: int = 8) -> int:
    """Largest divisor of ``b`` that is <= preferred (batch blocking)."""
    for cand in range(min(preferred, b), 0, -1):
        if b % cand == 0:
            return cand
    return 1
