"""Loss functions (pure jnp, fp32 accumulation).

Behavioral contract follows the reference losses (reference: src/loss.py):

  * ``miner_loss``: cross-entropy over the (1+npratio) candidate logits with
    the argmax of the one-hot label row as target, plus the disagreement
    regularizer — the mean pairwise cosine similarity among the K interest
    vectors with a zeroed diagonal (reference: src/loss.py:27-44).
  * ``vanilla_loss``: plain cross-entropy; 2-D labels are converted with
    argmax, 1-D integer labels are used directly (reference: src/loss.py:19-25).
  * ``eval losses``: ``-(logsigmoid(logits) * labels).sum()`` (+ disagreement
    for the MINER variant) (reference: src/loss.py:47-85).
  * ``pretrain_contrastive``: candidate-slot layout [vanilla positive,
    3 augmentations, negatives...]; maximizes (negated) the summed cosine
    between the positive and the negatives plus 0.001x the positive-to-
    augmentation cosine (reference: src/loss.py:87-98).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from miner_tpu.utils import pairwise_cosine_similarity


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean CE with integer targets, computed in fp32."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def disagreement(
    interests: jax.Array, row_mask: jax.Array | None = None
) -> jax.Array:
    """Mean pairwise cosine among the K interest vectors (diagonal zeroed).

    ``row_mask`` (B,) excludes padded tail-batch rows from the mean (the
    fixed-shape Batcher repeats row 0 to fill the last batch; those duplicate
    rows must not contribute — reference batches are ragged, so the
    reference has no equivalent term to inflate).
    """
    cos = pairwise_cosine_similarity(
        interests.astype(jnp.float32),
        interests.astype(jnp.float32),
        zero_diagonal=True,
    )
    if row_mask is None:
        return jnp.mean(cos)
    m = row_mask.astype(jnp.float32)
    per_row = jnp.mean(cos, axis=tuple(range(1, cos.ndim)))
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def miner_loss(interests: jax.Array, logits: jax.Array, labels: jax.Array) -> jax.Array:
    """CE + disagreement; ``labels`` is the one-hot (B, C) click indicator."""
    targets = jnp.argmax(labels, axis=-1)
    return cross_entropy(logits, targets) + disagreement(interests)


def vanilla_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    if labels.ndim > 1:
        targets = jnp.argmax(labels, axis=-1)
    else:
        targets = labels.astype(jnp.int32)
    return cross_entropy(logits, targets)


def logsigmoid_eval_loss(
    logits: jax.Array, labels: jax.Array, row_mask: jax.Array | None = None
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    terms = jax.nn.log_sigmoid(logits) * labels.astype(jnp.float32)
    if row_mask is not None:
        m = row_mask.astype(jnp.float32)
        terms = terms * m.reshape(m.shape + (1,) * (terms.ndim - 1))
    return -jnp.sum(terms)


def miner_eval_loss(
    interests: jax.Array,
    logits: jax.Array,
    labels: jax.Array,
    row_mask: jax.Array | None = None,
) -> jax.Array:
    return logsigmoid_eval_loss(logits, labels, row_mask) + disagreement(
        interests, row_mask
    )


def pretrain_contrastive(
    embs: jax.Array,
    num_augmentations: int = 3,
    row_mask: jax.Array | None = None,
) -> jax.Array:
    """Contrastive news-encoder pretraining loss.

    ``embs``: (B, C, D) with slot 0 = vanilla positive, slots 1..1+A =
    augmented positives, the rest negatives.

    ``row_mask`` (B,) excludes padded tail-batch rows (the fixed-shape
    Batcher repeats row 0 to fill the last batch) — used by the pretrain
    EVAL loop, whose total must match the reference pretrainer's sum over
    ragged batches (reference: src/pretrainer.py:266-274, the summed
    ``compute_pretrain`` with the normalization commented out upstream).
    """
    positive = embs[:, :1, :]
    augmentations = embs[:, 1 : 1 + num_augmentations, :]
    negatives = embs[:, 1 + num_augmentations :, :]
    main = pairwise_cosine_similarity(positive, negatives)
    aug = pairwise_cosine_similarity(positive, augmentations)
    if row_mask is not None:
        m = row_mask.astype(main.dtype)
        main = main * m.reshape(m.shape + (1,) * (main.ndim - 1))
        aug = aug * m.reshape(m.shape + (1,) * (aug.ndim - 1))
    return -(jnp.sum(main) + 0.001 * jnp.sum(aug))


def binary_cross_entropy_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean BCE for single-logit models (UnBERT train path)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
