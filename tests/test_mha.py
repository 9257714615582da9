"""Fused multi-head attention kernel (ops/mha.py) equivalence tests.

Run in Pallas interpret mode on the CPU test platform; the same code path is
exercised compiled on TPU by bench.py / the trainer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

# pltpu.prng_* are not implemented in Pallas interpret mode; dropout tests
# run compiled on the real TPU via tools/validate_mha_tpu.py
requires_tpu_prng = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pallas PRNG unsupported in interpret mode",
)

from miner_tpu.ops.mha import fused_mha, mha_reference

# interpret on the CPU test platform; compiled on real TPU
INTERP = jax.default_backend() == "cpu"

N, L, H, Dh = 3, 128, 4, 32
D = H * Dh


@pytest.fixture
def inputs(rng):
    qkv = jnp.asarray(rng.normal(size=(N, L, 3 * D)).astype(np.float32)) * 0.3
    mask = np.ones((N, L), np.int32)
    mask[1, 100:] = 0  # padded tail on one row
    return qkv, jnp.asarray(mask)


@pytest.mark.smoke
def test_fused_matches_reference_no_dropout(inputs):
    qkv, mask = inputs
    seed = jnp.zeros((1,), jnp.int32)
    out = fused_mha(qkv, mask, seed, H, 0.0, INTERP)
    ref = mha_reference(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_reference(inputs):
    qkv, mask = inputs
    seed = jnp.zeros((1,), jnp.int32)

    def f_fused(qkv):
        return jnp.sum(fused_mha(qkv, mask, seed, H, 0.0, INTERP) ** 2)

    def f_ref(qkv):
        return jnp.sum(mha_reference(qkv, mask, H) ** 2)

    g_fused = jax.grad(f_fused)(qkv)
    g_ref = jax.grad(f_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


@requires_tpu_prng
def test_dropout_deterministic_per_seed(inputs):
    qkv, mask = inputs
    s1 = jnp.asarray([7], jnp.int32)
    s2 = jnp.asarray([8], jnp.int32)
    a = fused_mha(qkv, mask, s1, H, 0.5, INTERP)
    b = fused_mha(qkv, mask, s1, H, 0.5, INTERP)
    c = fused_mha(qkv, mask, s2, H, 0.5, INTERP)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


@requires_tpu_prng
def test_dropout_mean_preserving(inputs):
    """Inverted dropout: E[out] == reference out; with K=0.3 the row sums of
    the dropped probability matrix should be ~1 on average."""
    qkv, mask = inputs
    rate = 0.3
    outs = []
    for s in range(8):
        seed = jnp.asarray([s], jnp.int32)
        outs.append(np.asarray(fused_mha(qkv, mask, seed, H, rate, INTERP),
                               np.float64))
    mean = np.stack(outs).mean(0)
    ref = np.asarray(mha_reference(qkv, mask, H), np.float64)
    # loose tolerance: 8 samples of a Bernoulli average
    assert np.abs(mean - ref).mean() < 0.05 * (np.abs(ref).mean() + 1)


def test_masked_rows_ignored(inputs):
    """Padded key positions must not influence valid queries."""
    qkv, mask = inputs
    seed = jnp.zeros((1,), jnp.int32)
    out1 = fused_mha(qkv, mask, seed, H, 0.0, INTERP)
    qkv2 = qkv.at[1, 100:, :].set(123.0)  # perturb masked tail of row 1
    out2 = fused_mha(qkv2, mask, seed, H, 0.0, INTERP)
    np.testing.assert_allclose(np.asarray(out1[1, :100]),
                               np.asarray(out2[1, :100]), rtol=1e-5, atol=1e-5)


def test_packed_short_sequences_match_reference(rng):
    """seqs > 1 packs short sequences into a 128-row block with a
    block-diagonal mask — must equal per-sequence attention."""
    from miner_tpu.ops.mha import mha_packing

    B, Ls = 8, 32
    pack = mha_packing(B, Ls)
    assert pack == 4
    qkv = jnp.asarray(rng.normal(size=(B, Ls, 3 * D)).astype(np.float32)) * 0.3
    mask = np.ones((B, Ls), np.int32)
    mask[2, 20:] = 0
    mask = jnp.asarray(mask)
    seed = jnp.zeros((1,), jnp.int32)

    packed = fused_mha(
        qkv.reshape(B // pack, pack * Ls, 3 * D),
        mask.reshape(B // pack, pack * Ls),
        seed, H, 0.0, INTERP, pack,
    ).reshape(B, Ls, D)
    ref = mha_reference(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients flow through the packed path identically
    g_p = jax.grad(lambda q: jnp.sum(fused_mha(
        q.reshape(B // pack, pack * Ls, 3 * D),
        mask.reshape(B // pack, pack * Ls), seed, H, 0.0, INTERP, pack) ** 2)
    )(qkv)
    g_r = jax.grad(lambda q: jnp.sum(mha_reference(q, mask, H) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=2e-4, atol=2e-4)


def test_padded_long_sequence_matches_reference(rng):
    """Non-aligned long sequences are zero-padded to a lane multiple (UnBERT
    L=300 -> 384): padded keys masked out, padded query rows sliced away."""
    from miner_tpu.ops.mha import mha_padding

    B, Lu = 2, 300
    pad = mha_padding(Lu)
    assert pad == 84
    qkv = jnp.asarray(rng.normal(size=(B, Lu, 3 * D)).astype(np.float32)) * 0.3
    mask = np.ones((B, Lu), np.int32)
    mask[0, 250:] = 0
    mask = jnp.asarray(mask)
    seed = jnp.zeros((1,), jnp.int32)

    out = fused_mha(
        jnp.pad(qkv, ((0, 0), (0, pad), (0, 0))),
        jnp.pad(mask, ((0, 0), (0, pad))),
        seed, H, 0.0, INTERP, 1,
    )[:, :Lu]
    ref = mha_reference(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_plm_fused_attention_matches_unfused(rng):
    """The PLM's fused-attention branch — including the 4-per-block packing
    glue for short L and zero-padding for non-aligned L — must reproduce the
    unfused forward (deterministic)."""
    import dataclasses as dc

    import miner_tpu.ops.mha as mha_mod
    from miner_tpu.models.plm import PLMConfig, TransformerPLM
    from miner_tpu.ops import common

    cfg = PLMConfig.tiny()

    for B, L in ((8, 32), (4, 160)):  # pack=4 path; pad 160->256 path
        ids = jnp.asarray(rng.integers(1, 500, size=(B, L)).astype(np.int32))
        mask = np.ones((B, L), np.int32)
        mask[0, L - 5:] = 0
        mask = jnp.asarray(mask)

        plm_a = TransformerPLM(cfg)
        params = plm_a.init(jax.random.PRNGKey(0), ids, mask)
        out_a = plm_a.apply(params, ids, mask)

        orig_on_tpu = common.on_tpu
        orig_call_fwd = mha_mod._call_fwd
        common.on_tpu = lambda: True
        mha_mod._call_fwd = (
            lambda qkv, m, s, h, r, interp, seqs=1:
            orig_call_fwd(qkv, m, s, h, r, True, seqs))
        try:
            plm_b = TransformerPLM(dc.replace(cfg, fused_attention=True))
            out_b = plm_b.apply(params, ids, mask)
        finally:
            common.on_tpu = orig_on_tpu
            mha_mod._call_fwd = orig_call_fwd
        # compare only positions the mask keeps (padded positions may differ)
        valid = np.asarray(mask, bool)
        np.testing.assert_allclose(
            np.asarray(out_a)[valid], np.asarray(out_b)[valid],
            rtol=2e-4, atol=2e-4, err_msg=f"L={L}")


def test_fused_mha_under_shard_map(rng):
    """The fused kernel composes with jax.shard_map over a data-parallel
    mesh (fwd and custom-vjp bwd) — the building block for enabling Pallas
    kernels on multi-chip meshes (currently auto-off; see
    Trainer._use_fused). Per-shard dropout seeds must be decorrelated with
    jax.lax.axis_index before enabling rate > 0 multi-chip."""
    from jax.sharding import Mesh, PartitionSpec as P

    n_dev = min(8, jax.device_count())
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    N2 = 2 * n_dev
    qkv = jnp.asarray(rng.normal(size=(N2, L, 3 * D)).astype(np.float32)) * 0.3
    mask = jnp.ones((N2, L), jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))

    f = jax.shard_map(
        lambda q, m, s: fused_mha(q, m, s, H, 0.0, INTERP),
        mesh=mesh, in_specs=(P("data"), P("data"), P()),
        out_specs=P("data"), check_vma=False,
    )
    out = jax.jit(f)(qkv, mask, seed)
    ref = mha_reference(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    g = jax.jit(jax.grad(lambda q: jnp.sum(f(q, mask, seed) ** 2)))(qkv)
    g_ref = jax.grad(lambda q: jnp.sum(mha_reference(q, mask, H) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-4,
                               atol=2e-4)
