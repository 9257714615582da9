"""Optimizer construction: AdamW + linear warmup + decay masking + freezing.

Behavioral contract follows the reference trainer's optimizer setup
(reference: src/trainer.py:119-123, 325-332 and src/base_trainer.py:237-249):

  * AdamW with two parameter groups — biases and LayerNorm weights get zero
    weight decay (implemented as an optax weight-decay mask);
  * linear warmup from 0 over ``warmup_steps`` then linear decay to 0 at
    ``total_steps`` (transformers' get_linear_schedule_with_warmup);
  * global-norm gradient clipping;
  * gradient accumulation via ``optax.MultiSteps`` (replacing the manual
    accumulation gate, reference: src/trainer.py:146-168);
  * parameter freezing (``freeze_transformer``, UniSRec's freeze-all-but-MoE)
    via ``optax.masked`` + zero updates on the frozen subtree.
"""
from __future__ import annotations

import math
import re
from typing import Callable, Optional

import jax
import optax


def linear_warmup_schedule(
    learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """Linear 0->lr over warmup, then linear lr->0 at total_steps."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        wfrac = jnp.minimum(step / warm, 1.0)
        decay_span = jnp.maximum(total_steps - warmup_steps, 1)
        dfrac = jnp.maximum(
            (total_steps - step) / decay_span, 0.0
        )
        return learning_rate * jnp.where(step < warmup_steps, wfrac, dfrac)

    return schedule


def scheduled_lr_value(
    learning_rate: float, warmup_steps: int, total_steps: int, step: int
) -> float:
    """Pure-python mirror of ``linear_warmup_schedule`` for logging the
    *actual* LR at a given optimizer step (no device roundtrip)."""
    if step < warmup_steps:
        return learning_rate * min(step / max(warmup_steps, 1), 1.0)
    return learning_rate * max(
        (total_steps - step) / max(total_steps - warmup_steps, 1), 0.0
    )


def warmup_steps_from_ratio(
    total_steps: int, warmup_ratio: float, warmup_steps: Optional[int] = None
) -> int:
    if warmup_steps is not None:
        return warmup_steps
    return math.ceil(total_steps * warmup_ratio)


_NO_DECAY = re.compile(r"(bias|scale|\bln\b|layer_norm|layernorm)", re.IGNORECASE)


def default_decay_mask(params) -> object:
    """True where weight decay applies: everything except biases/LN scales.

    This matches the reference's grouping exactly (reference:
    src/trainer.py:325-332, the standard transformers recipe): only
    parameters named 'bias' or 'LayerNorm.weight' are excluded — embedding
    tables DO get decay, as they do in the reference.  In our parameter
    tree, flax LayerNorm params are 'scale'/'bias'; rank-<2 leaves are also
    excluded (they are exactly the biases/scales plus scalar counters).
    """

    def mask_fn(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        name = "/".join(str(n) for n in names)
        if leaf.ndim < 2:
            return False
        if _NO_DECAY.search(name.split("/")[-1] or ""):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def freeze_mask_from_predicate(params, trainable_pred: Callable[[str], bool]):
    """Pytree of bools: True where the parameter trains."""

    def mask_fn(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return bool(trainable_pred(name))

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    params,
    learning_rate: float,
    total_steps: int,
    warmup_steps: int,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    accum_steps: int = 1,
    trainable_pred: Optional[Callable[[str], bool]] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    schedule = linear_warmup_schedule(learning_rate, warmup_steps, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            schedule,
            b1=b1,
            b2=b2,
            eps=eps,
            weight_decay=weight_decay,
            mask=default_decay_mask(params),
        ),
    )
    if trainable_pred is not None:
        frozen = jax.tree_util.tree_map(
            lambda t: "trainable" if t else "frozen",
            freeze_mask_from_predicate(params, trainable_pred),
        )
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, frozen
        )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
