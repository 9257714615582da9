"""Loss functions validated against torch-computed golden values."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

import jax.numpy as jnp

from miner_tpu.training import losses


def _torch():
    import torch

    return torch


def test_cross_entropy_matches_torch():
    torch = _torch()
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = np.eye(5, dtype=np.float32)[rng.integers(0, 5, size=8)]
    got = float(losses.vanilla_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels).argmax(dim=1)
        )
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_vanilla_loss_integer_labels():
    torch = _torch()
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=6)
    got = float(losses.vanilla_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        torch.nn.functional.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    )
    assert got == pytest.approx(want, rel=1e-4)


def _torch_pairwise_cosine(x, y, zero_diagonal=False):
    torch = _torch()
    x = torch.tensor(x)
    y = torch.tensor(y)
    xn = torch.linalg.norm(x, dim=2, keepdim=True)
    yn = torch.linalg.norm(y, dim=2, keepdim=True)
    d = torch.matmul(x / xn, (y / yn).permute(0, 2, 1))
    if zero_diagonal:
        mask = torch.eye(x.shape[1]).repeat(x.shape[0], 1, 1).bool()
        d.masked_fill_(mask, 0)
    return d


def test_miner_loss_matches_torch_reference_math():
    torch = _torch()
    rng = np.random.default_rng(2)
    B, K, D, C = 4, 8, 16, 5
    interests = rng.normal(size=(B, K, D)).astype(np.float32)
    logits = rng.normal(size=(B, C)).astype(np.float32)
    labels = np.eye(C, dtype=np.float32)[rng.integers(0, C, size=B)]

    got = float(losses.miner_loss(jnp.asarray(interests), jnp.asarray(logits), jnp.asarray(labels)))

    disagreement = float(_torch_pairwise_cosine(interests, interests, True).mean())
    rank = float(
        torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels).argmax(dim=1)
        )
    )
    assert got == pytest.approx(disagreement + rank, rel=1e-4)


def test_eval_loss_matches_torch():
    torch = _torch()
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(10, 1)).astype(np.float32)
    labels = rng.integers(0, 2, size=(10, 1)).astype(np.float32)
    got = float(losses.logsigmoid_eval_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        -(torch.nn.functional.logsigmoid(torch.tensor(logits)) * torch.tensor(labels)).sum()
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_pretrain_contrastive_matches_torch():
    rng = np.random.default_rng(4)
    B, C, D = 3, 8, 12  # slot 0 pos, 1:4 augs, 4: negs
    embs = rng.normal(size=(B, C, D)).astype(np.float32)
    got = float(losses.pretrain_contrastive(jnp.asarray(embs)))
    pos = embs[:, :1, :]
    main = float(_torch_pairwise_cosine(pos, embs[:, 4:, :]).sum())
    aug = float(_torch_pairwise_cosine(pos, embs[:, 1:4, :]).sum())
    assert got == pytest.approx(-(main + 0.001 * aug), rel=1e-4)


def test_disagreement_of_orthogonal_vectors_is_zero():
    interests = jnp.eye(4)[None, :, :]  # orthogonal rows
    assert float(losses.disagreement(interests)) == pytest.approx(0.0, abs=1e-7)


def test_bce_with_logits_matches_torch():
    torch = _torch()
    rng = np.random.default_rng(5)
    logits = rng.normal(size=20).astype(np.float32)
    labels = rng.integers(0, 2, size=20).astype(np.float32)
    got = float(losses.binary_cross_entropy_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(labels)
        )
    )
    assert got == pytest.approx(want, rel=1e-4)
