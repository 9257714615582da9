"""Shared helpers for the Pallas kernel layer."""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def pick_block(b: int, preferred: int = 8) -> int:
    """Largest divisor of ``b`` that is <= preferred (batch blocking)."""
    for cand in range(min(preferred, b), 0, -1):
        if b % cand == 0:
            return cand
    return 1
