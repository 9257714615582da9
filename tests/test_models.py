"""Model-block tests: shapes, masking semantics, parity with reference math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miner_tpu.models import (
    Fastformer,
    FastformerUserModel,
    Miner,
    NewsEncoder,
    NewsEncoderMoe,
    MoEAdaptor,
    PLMConfig,
    PolyAttention,
    TargetAwareAttention,
    TransformerPLM,
    UNBert,
    UniSRec,
)
from miner_tpu.models.fastformer import FastformerConfig
from miner_tpu.utils import pairwise_cosine_similarity

TINY = PLMConfig.tiny()


def _make_batch(rng, B=2, C=3, H=5, Lt=8, Ls=12, vocab=1000, n_cat=7):
    def ids(shape):
        return rng.integers(1, vocab, size=shape).astype(np.int32)

    def mask(shape):
        m = np.ones(shape, dtype=np.int32)
        return m

    batch = {
        "cand_title": ids((B, C, Lt)),
        "cand_title_mask": mask((B, C, Lt)),
        "cand_sapo": ids((B, C, Ls)),
        "cand_sapo_mask": mask((B, C, Ls)),
        "cand_category": rng.integers(1, n_cat, size=(B, C)).astype(np.int32),
        "his_title": ids((B, H, Lt)),
        "his_title_mask": mask((B, H, Lt)),
        "his_sapo": ids((B, H, Ls)),
        "his_sapo_mask": mask((B, H, Ls)),
        "his_category": rng.integers(1, n_cat, size=(B, H)).astype(np.int32),
        "his_mask": np.ones((B, H), dtype=np.int32),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_plm_shapes_and_mask_invariance(rng):
    """Padded tokens must not influence unmasked positions."""
    model = TransformerPLM(TINY)
    ids = jnp.asarray(rng.integers(1, 1000, size=(2, 10)).astype(np.int32))
    mask = jnp.asarray(np.array([[1] * 6 + [0] * 4, [1] * 10], dtype=np.int32))
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (2, 10, TINY.hidden_size)

    # change the padded tokens -> outputs at valid positions unchanged
    ids2 = ids.at[0, 6:].set(999)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(out[0, :6], out2[0, :6], atol=1e-5)


def test_poly_attention_masking(rng):
    B, H, D, K, P = 2, 6, 16, 4, 8
    emb = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0], [1] * 6], dtype=np.int32))
    model = PolyAttention(num_context_codes=K, context_code_dim=P)
    params = model.init(jax.random.PRNGKey(0), emb, mask)
    out = model.apply(params, emb, mask)
    assert out.shape == (B, K, D)
    # Perturb masked history rows -> output unchanged (neg-inf masking)
    emb2 = emb.at[0, 3:].set(100.0)
    out2 = model.apply(params, emb2, mask)
    np.testing.assert_allclose(out[0], out2[0], atol=1e-5)


def test_poly_attention_legacy_mask_differs(rng):
    """legacy 1e-30 fill reproduces the reference quirk: padded rows DO get weight."""
    B, H, D, K, P = 1, 4, 8, 2, 4
    emb = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 0, 0]], dtype=np.int32))
    m_new = PolyAttention(num_context_codes=K, context_code_dim=P)
    m_old = PolyAttention(num_context_codes=K, context_code_dim=P, legacy_mask=True)
    params = m_new.init(jax.random.PRNGKey(0), emb, mask)
    out_new = m_new.apply(params, emb, mask)
    out_old = m_old.apply(params, emb, mask)
    assert not np.allclose(np.asarray(out_new), np.asarray(out_old))


def test_target_aware_attention_shapes(rng):
    B, K, C, D = 2, 4, 5, 16
    q = jnp.asarray(rng.normal(size=(B, K, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, C, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, C, K)).astype(np.float32))
    model = TargetAwareAttention(embed_dim=D)
    params = model.init(jax.random.PRNGKey(0), q, k, v)
    out = model.apply(params, q, k, v)
    assert out.shape == (B, C)


def test_target_aware_attention_matches_torch(rng):
    """Parity with the reference math (softmax(key @ gelu(Wq)^T) . value)."""
    import torch

    B, K, C, D = 2, 3, 4, 8
    q = rng.normal(size=(B, K, D)).astype(np.float32)
    k = rng.normal(size=(B, C, D)).astype(np.float32)
    v = rng.normal(size=(B, C, K)).astype(np.float32)
    model = TargetAwareAttention(embed_dim=D)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    W = np.asarray(params["params"]["proj"]["kernel"])  # (D, D)

    got = np.asarray(model.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    tq, tk, tv = torch.tensor(q), torch.tensor(k), torch.tensor(v)
    proj = torch.nn.functional.gelu(tq @ torch.tensor(W))
    weights = torch.softmax(tk @ proj.permute(0, 2, 1), dim=2)
    want = (weights * tv).sum(dim=2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pairwise_cosine_matches_torch(rng):
    import torch

    x = rng.normal(size=(2, 4, 8)).astype(np.float32)
    y = rng.normal(size=(2, 5, 8)).astype(np.float32)
    got = np.asarray(pairwise_cosine_similarity(jnp.asarray(x), jnp.asarray(y)))
    tx, ty = torch.tensor(x), torch.tensor(y)
    xn = torch.linalg.norm(tx, dim=2, keepdim=True)
    yn = torch.linalg.norm(ty, dim=2, keepdim=True)
    want = ((tx / xn) @ (ty / yn).permute(0, 2, 1)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_news_encoder_linear_combine(rng):
    enc = NewsEncoder(plm_cfg=TINY, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=True, combine_type="linear")
    title = jnp.asarray(rng.integers(1, 1000, size=(4, 8)).astype(np.int32))
    tmask = jnp.ones((4, 8), dtype=jnp.int32)
    sapo = jnp.asarray(rng.integers(1, 1000, size=(4, 12)).astype(np.int32))
    smask = jnp.ones((4, 12), dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), title, tmask, sapo, smask)
    out = enc.apply(params, title, tmask, sapo, smask)
    assert out.shape == (4, 32)


def test_news_encoder_lstm_combine(rng):
    enc = NewsEncoder(plm_cfg=TINY, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=True, combine_type="lstm")
    title = jnp.asarray(rng.integers(1, 1000, size=(4, 8)).astype(np.int32))
    tmask = jnp.ones((4, 8), dtype=jnp.int32)
    sapo = jnp.asarray(rng.integers(1, 1000, size=(4, 12)).astype(np.int32))
    smask = jnp.ones((4, 12), dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), title, tmask, sapo, smask)
    out = enc.apply(params, title, tmask, sapo, smask)
    assert out.shape == (4, 32)


def test_news_encoder_title_only(rng):
    enc = NewsEncoder(plm_cfg=TINY, apply_reduce_dim=False, use_sapo=False)
    title = jnp.asarray(rng.integers(1, 1000, size=(4, 8)).astype(np.int32))
    tmask = jnp.ones((4, 8), dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), title, tmask)
    out = enc.apply(params, title, tmask)
    assert out.shape == (4, TINY.hidden_size)


def test_miner_forward(rng):
    enc = NewsEncoder(plm_cfg=TINY, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=True, combine_type="linear")
    model = Miner(news_encoder=enc, use_category_bias=True, num_context_codes=4,
                  context_code_dim=16, score_type="weighted", num_categories=7,
                  category_embed_dim=8, category_pad_id=0)
    batch = _make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)
    interests, scores = model.apply(params, batch)
    assert interests.shape == (2, 4, 32)
    assert scores.shape == (2, 3)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("score_type", ["max", "mean"])
def test_miner_score_types(rng, score_type):
    enc = NewsEncoder(plm_cfg=TINY, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=False)
    model = Miner(news_encoder=enc, use_category_bias=False, num_context_codes=4,
                  context_code_dim=16, score_type=score_type)
    batch = _make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)
    _, scores = model.apply(params, batch)
    assert scores.shape == (2, 3)


def test_fastformer_user_encoder(rng):
    cfg = FastformerConfig(hidden_size=32, num_heads=4, intermediate_size=32,
                           num_layers=2, max_position_embeddings=16)
    model = Fastformer(cfg)
    x = jnp.asarray(rng.normal(size=(2, 6, 32)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1] * 6], dtype=np.int32))
    params = model.init(jax.random.PRNGKey(0), x, mask)
    out = model.apply(params, x, mask)
    assert out.shape == (2, 32)
    # masked positions must not affect the pooled output
    x2 = x.at[0, 4:].set(50.0)
    out2 = model.apply(params, x2, mask)
    np.testing.assert_allclose(out[0], out2[0], atol=1e-3)


def test_fastformer_full_model(rng):
    cfg = FastformerConfig(hidden_size=32, num_heads=4, intermediate_size=32,
                           num_layers=2, max_position_embeddings=16)
    enc = NewsEncoder(plm_cfg=TINY, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=True, combine_type="linear")
    model = FastformerUserModel(news_encoder=enc, cfg=cfg)
    batch = _make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)
    scores = model.apply(params, batch)
    assert scores.shape == (2, 3)


def test_moe_adaptor(rng):
    model = MoEAdaptor(n_experts=4, out_dim=24)
    x = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (6, 24)
    # training mode adds gating noise -> needs the rng; result differs
    out_train = model.apply(
        params, x, deterministic=False,
        rngs={"gating": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert out_train.shape == (6, 24)


def test_unisrec_forward(rng):
    enc = NewsEncoderMoe(plm_cfg=TINY, adaptor_out_dim=24)
    model = UniSRec(news_encoder=enc, max_his_len=5)
    batch = _make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)
    scores = model.apply(params, batch)
    assert scores.shape == (2, 3)


def test_unbert_forward(rng):
    B, L, S = 2, 40, 6
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 1000, size=(B, L)).astype(np.int32)),
        "input_mask": jnp.ones((B, L), dtype=jnp.int32),
        "segment_ids": jnp.asarray(rng.integers(0, 2, size=(B, L)).astype(np.int32)),
        "news_segment_ids": jnp.asarray(rng.integers(0, 10, size=(B, L)).astype(np.int32)),
        "sentence_ids": jnp.asarray(
            np.sort(rng.choice(L, size=(B, S), replace=False)).astype(np.int32)
        ),
        "sentence_mask": jnp.ones((B, S), dtype=jnp.int32),
    }
    model = UNBert(cfg=TINY, num_news_layers=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    scores = model.apply(params, batch)
    assert scores.shape == (B,)


def test_unbert_mean_attention_modes(rng):
    """mean/attention aggregation (reference: model_unbert.py:160-200) as
    static-shape segment reductions: the mean of news i's hidden states over
    [sentence_ids[i], sentence_ids[i+1]) — verified against a hand-computed
    segment mean of the word-level encoder output."""
    B, L, S = 2, 24, 4
    starts = np.tile(np.array([0, 6, 11, 18], dtype=np.int32), (B, 1))
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 1000, size=(B, L)).astype(np.int32)),
        "input_mask": jnp.ones((B, L), dtype=jnp.int32),
        "segment_ids": jnp.zeros((B, L), dtype=jnp.int32),
        "news_segment_ids": jnp.asarray(
            np.repeat(np.arange(4), [6, 5, 7, 6])[None, :].repeat(B, 0).astype(np.int32)
        ),
        "sentence_ids": jnp.asarray(starts),
        "sentence_mask": jnp.ones((B, S), dtype=jnp.int32),
    }
    for mode in ("mean", "attention"):
        model = UNBert(cfg=TINY, num_news_layers=1, news_mode=mode)
        params = model.init(jax.random.PRNGKey(0), batch)
        scores = model.apply(params, batch)
        assert scores.shape == (B,)
        assert np.isfinite(np.asarray(scores)).all()

    # segment-weight mask correctness: spans are [0,6) [6,11) [11,18) [18,24)
    model = UNBert(cfg=TINY, news_mode="mean")
    w = model._segment_weights(batch, L)
    w = np.asarray(w)
    assert w.shape == (B, S, L)
    assert w[0, 0, :6].all() and not w[0, 0, 6:].any()
    assert w[0, 2, 11:18].all() and not w[0, 2, :11].any() and not w[0, 2, 18:].any()
    assert w[0, 3, 18:].all()

    # masked-out sentence contributes no tokens; last valid span runs to L
    batch2 = dict(batch)
    batch2["sentence_mask"] = jnp.asarray(np.array([[1, 1, 1, 0]] * B, np.int32))
    w2 = np.asarray(model._segment_weights(batch2, L))
    assert not w2[0, 3].any()
    assert w2[0, 2, 11:].all()


def test_scan_layers_matches_unrolled(rng):
    """lax.scan over the layer stack must be numerically identical to the
    unrolled loop (same params via hf_import.stack_layer_params), forward
    and gradients."""
    import dataclasses as dc

    import jax

    from miner_tpu.models.hf_import import stack_layer_params
    from miner_tpu.models.plm import PLMConfig, TransformerPLM

    cfg = PLMConfig.tiny()
    B, L = 4, 16
    ids = jnp.asarray(rng.integers(1, 500, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)

    plm_u = TransformerPLM(cfg)
    params_u = plm_u.init(jax.random.PRNGKey(0), ids, mask)["params"]
    params_s = jax.tree_util.tree_map(
        jnp.asarray, stack_layer_params(params_u)
    )
    plm_s = TransformerPLM(dc.replace(cfg, scan_layers=True))
    # structure check against a scanned init
    init_s = plm_s.init(jax.random.PRNGKey(0), ids, mask)["params"]
    assert jax.tree_util.tree_structure(init_s) == \
        jax.tree_util.tree_structure(params_s)

    out_u = plm_u.apply({"params": params_u}, ids, mask)
    out_s = plm_s.apply({"params": params_s}, ids, mask)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)

    def loss_u(p):
        return jnp.sum(plm_u.apply({"params": p}, ids, mask) ** 2)

    def loss_s(p):
        return jnp.sum(plm_s.apply({"params": p}, ids, mask) ** 2)

    g_u = jax.grad(loss_u)(params_u)
    g_s = jax.grad(loss_s)(params_s)
    g_u_stacked = stack_layer_params(
        jax.tree_util.tree_map(np.asarray, g_u)
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_s),
        jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(jnp.asarray, g_u_stacked)),
    ):
        # scan reorders the fp32 backward accumulation; tolerate
        # reduction-order noise only
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=5e-5,
            err_msg=jax.tree_util.keystr(pa))

    # remat + scan compose
    plm_sr = TransformerPLM(dc.replace(cfg, scan_layers=True, remat=True))
    out_sr = plm_sr.apply({"params": params_s}, ids, mask)
    np.testing.assert_allclose(np.asarray(out_sr), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("policy", ["", "dots"])
def test_remat_policy_identity(rng, policy):
    """Rematerialization (full or dots-saveable selective) must be a pure
    scheduling choice: forward output and gradients bit-compare against the
    no-remat tower with the same params."""
    import dataclasses as dc

    from miner_tpu.models.plm import PLMConfig, TransformerPLM

    cfg = PLMConfig.tiny()
    B, L = 4, 16
    ids = jnp.asarray(rng.integers(1, 500, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)

    plm0 = TransformerPLM(cfg)
    params = plm0.init(jax.random.PRNGKey(0), ids, mask)["params"]
    plm_r = TransformerPLM(dc.replace(cfg, remat=True, remat_policy=policy))

    out0 = plm0.apply({"params": params}, ids, mask)
    out_r = plm_r.apply({"params": params}, ids, mask)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out0))

    g0 = jax.grad(lambda p: jnp.sum(
        plm0.apply({"params": p}, ids, mask) ** 2))(params)
    g_r = jax.grad(lambda p: jnp.sum(
        plm_r.apply({"params": p}, ids, mask) ** 2))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_r),
        jax.tree_util.tree_leaves_with_path(g0),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(pa))


def test_remat_policy_unknown_rejected(rng):
    """Config construction itself validates the policy — a typo is loud even
    when remat is off (where the tower's remat branch would never run)."""
    import dataclasses as dc

    from miner_tpu.models.plm import PLMConfig

    with pytest.raises(ValueError, match="remat_policy"):
        dc.replace(PLMConfig.tiny(), remat=True, remat_policy="bogus")
    with pytest.raises(ValueError, match="remat_policy"):
        dc.replace(PLMConfig.tiny(), remat=False, remat_policy="bogus")


def test_remat_policy_without_remat_rejected():
    """--remat_policy dots without --remat is a silent no-op in the tower;
    plm_config refuses it loudly instead."""
    from miner_tpu.config import plm_config

    with pytest.raises(ValueError, match="--remat"):
        plm_config("tiny", remat=False, remat_policy="dots")
    cfg = plm_config("tiny", remat=True, remat_policy="dots")
    assert cfg.remat and cfg.remat_policy == "dots"
