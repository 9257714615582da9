"""Small shared utilities (pure JAX/numpy)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def candidate_bucket(n: int, minimum: int = 16) -> int:
    """Next power of two >= max(n, minimum) — bounds the number of compiled
    scoring-program shapes at log2(corpus). Shared by the serving layer
    (slate/batch padding) and the trainer's corpus top-k program."""
    b = minimum
    while b < n:
        b *= 2
    return b


def pairwise_cosine_similarity(
    x: jax.Array, y: jax.Array, zero_diagonal: bool = False
) -> jax.Array:
    """Batched pairwise cosine similarity.

    Matches the semantics of the reference helper (reference: src/utils.py:9-29):
    ``x``: (B, M, D), ``y``: (B, N, D) -> (B, M, N); when ``zero_diagonal`` the
    M==N diagonal is zeroed (used by the disagreement regularizer).

    Note the reference divides by the raw norm with no epsilon; an exactly-zero
    row would produce NaN there too.  We keep an epsilon-free default off the
    hot path but guard with a tiny clamp so padded all-zero rows don't poison
    gradients on TPU.
    """
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    y_norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
    x = x / jnp.maximum(x_norm, 1e-12)
    y = y / jnp.maximum(y_norm, 1e-12)
    sim = jnp.einsum("bmd,bnd->bmn", x, y)
    if zero_diagonal:
        if x.shape[1] != y.shape[1]:
            raise ValueError("zero_diagonal requires M == N")
        eye = jnp.eye(x.shape[1], dtype=bool)
        sim = jnp.where(eye[None, :, :], 0.0, sim)
    return sim


def set_seed(seed: int) -> np.random.Generator:
    """Seed numpy's global RNG (for legacy paths) and return a fresh Generator.

    The framework threads explicit ``np.random.Generator`` objects through all
    sampling code; the global seed is set only as a belt-and-braces measure for
    third-party code.
    """
    np.random.seed(seed)
    return np.random.default_rng(seed)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tree_size(tree) -> int:
    """Total number of parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
