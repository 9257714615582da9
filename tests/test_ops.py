"""Pallas kernel equivalence tests (interpret mode on CPU) + gradient checks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miner_tpu.ops.fastformer_attn import (
    fastformer_attention_fused,
    fastformer_attention_reference,
)
from miner_tpu.ops.lookup_score import lookup_score_fused, lookup_score_reference
from miner_tpu.ops.poly_attention import (
    poly_attention_fused,
    poly_attention_reference,
)


@pytest.fixture
def poly_inputs(rng):
    B, H, D, P, K = 4, 10, 32, 24, 6
    emb = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, P)).astype(np.float32) * 0.1)
    codes = jnp.asarray(rng.normal(size=(K, P)).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.random((B, H)) > 0.3).astype(np.int32))
    mask = mask.at[:, 0].set(1)  # at least one valid position
    bias = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    return emb, w, codes, mask, bias


@pytest.mark.smoke
def test_poly_attention_kernel_matches_reference(poly_inputs):
    emb, w, codes, mask, bias = poly_inputs
    ref = poly_attention_reference(emb, w, codes, mask, bias)
    got = poly_attention_fused(emb, w, codes, mask, bias, True)  # interpret
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_poly_attention_kernel_no_bias(poly_inputs):
    emb, w, codes, mask, _ = poly_inputs
    ref = poly_attention_reference(emb, w, codes, mask, None)
    got = poly_attention_fused(emb, w, codes, mask, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_poly_attention_gradients(poly_inputs):
    emb, w, codes, mask, bias = poly_inputs

    def loss_fused(e, w_, c, b):
        return jnp.sum(poly_attention_fused(e, w_, c, mask, b, True) ** 2)

    def loss_ref(e, w_, c, b):
        return jnp.sum(poly_attention_reference(e, w_, c, mask, b) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(emb, w, codes, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(emb, w, codes, bias)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)


def test_poly_reference_matches_module(poly_inputs, rng):
    """The fused-op reference math must equal the flax PolyAttention module."""
    from miner_tpu.models.poly_attention import PolyAttention

    emb, w, codes, mask, bias = poly_inputs
    K, P = codes.shape
    model = PolyAttention(num_context_codes=K, context_code_dim=P)
    params = {"params": {"proj_kernel": w, "context_codes": codes}}
    # module takes the (B,H,C)-shaped bias and means over candidates
    bias3 = jnp.repeat(bias[:, :, None], 3, axis=2)
    want = model.apply(params, emb, mask, bias3)
    got = poly_attention_reference(emb, w, codes, mask, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.fixture
def ff_inputs(rng):
    B, L, D, h = 4, 8, 32, 4
    q = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    wqa = jnp.asarray(rng.normal(size=(D, h)).astype(np.float32) * 0.1)
    bqa = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1)
    wka = jnp.asarray(rng.normal(size=(D, h)).astype(np.float32) * 0.1)
    bka = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    return q, k, wqa, bqa, wka, bka, mask, h


@pytest.mark.smoke
def test_fastformer_kernel_matches_reference(ff_inputs):
    q, k, wqa, bqa, wka, bka, mask, h = ff_inputs
    ref = fastformer_attention_reference(q, k, wqa, bqa, wka, bka, mask, h)
    got = fastformer_attention_fused(q, k, wqa, bqa, wka, bka, mask, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fastformer_gradients(ff_inputs):
    q, k, wqa, bqa, wka, bka, mask, h = ff_inputs

    def loss_fused(q_, k_):
        return jnp.sum(
            fastformer_attention_fused(q_, k_, wqa, bqa, wka, bka, mask, h, True) ** 2
        )

    def loss_ref(q_, k_):
        return jnp.sum(
            fastformer_attention_reference(q_, k_, wqa, bqa, wka, bka, mask, h) ** 2
        )

    gf = jax.grad(loss_fused, argnums=(0, 1))(q, k)
    gr = jax.grad(loss_ref, argnums=(0, 1))(q, k)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fastformer_reference_matches_torch_math(ff_inputs):
    """Cross-check the additive-attention math against a torch re-derivation
    of the reference block (reference: src/model/model.py:373-455)."""
    import torch

    q, k, wqa, bqa, wka, bka, mask, h = ff_inputs
    B, L, D = q.shape
    hd = D // h
    tq = torch.tensor(np.asarray(q))
    tk = torch.tensor(np.asarray(k))
    add_mask = torch.tensor(
        np.where(np.asarray(mask) != 0, 0.0, -10000.0).astype(np.float32)
    )[:, None, :]  # (B,1,L) broadcast over heads

    q_score = (tq @ torch.tensor(np.asarray(wqa)) + torch.tensor(np.asarray(bqa)))
    q_score = q_score.transpose(1, 2) / hd ** 0.5 + add_mask
    alpha = torch.softmax(q_score, dim=-1).unsqueeze(2)  # (B,h,1,L)
    q_heads = tq.view(B, L, h, hd).permute(0, 2, 1, 3)
    pooled_q = torch.matmul(alpha, q_heads).transpose(1, 2).reshape(B, 1, D)
    u = tk * pooled_q
    k_score = (u @ torch.tensor(np.asarray(wka)) + torch.tensor(np.asarray(bka)))
    k_score = k_score.transpose(1, 2) / hd ** 0.5 + add_mask
    beta = torch.softmax(k_score, dim=-1).unsqueeze(2)
    u_heads = u.view(B, L, h, hd).permute(0, 2, 1, 3)
    pooled_k = torch.matmul(beta, u_heads)  # (B,h,1,hd)
    want = (pooled_k * q_heads).transpose(1, 2).reshape(B, L, D).numpy()

    got = fastformer_attention_reference(q, k, wqa, bqa, wka, bka, mask, h)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_lookup_score_matches_reference(rng):
    N, D, B, C, K = 50, 32, 4, 5, 6
    cache = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, C)).astype(np.int32))
    interests = jnp.asarray(rng.normal(size=(B, K, D)).astype(np.float32))
    ref = lookup_score_reference(cache, idx, interests)
    got = lookup_score_fused(cache, idx, interests, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
