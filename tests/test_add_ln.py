"""Fused dropout+residual+LayerNorm kernel (ops/add_ln.py) tests —
interpret mode on CPU; dropout paths validated compiled on TPU via
tools/validate_add_ln_tpu.py."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

import jax
import jax.numpy as jnp
import flax.linen as nn

from miner_tpu.ops.add_ln import add_ln_reference, fused_dropout_add_ln

INTERP = jax.default_backend() == "cpu"
T, D = 64, 96


@pytest.fixture
def inputs(rng):
    x = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1 + 1.0)
    bias = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    return x, h, scale, bias


def test_fwd_matches_reference_and_flax(inputs):
    x, h, scale, bias = inputs
    seed = jnp.zeros((1,), jnp.int32)
    y = fused_dropout_add_ln(x, h, scale, bias, seed, 0.0, 1e-12, INTERP)
    ref = add_ln_reference(x, h, scale, bias, 1e-12)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    ln = nn.LayerNorm(epsilon=1e-12)
    flax_y = ln.apply({"params": {"scale": scale, "bias": bias}}, x + h)
    np.testing.assert_allclose(np.asarray(y), np.asarray(flax_y), rtol=1e-4,
                               atol=1e-4)


def test_gradients_match_reference(inputs):
    x, h, scale, bias = inputs
    seed = jnp.zeros((1,), jnp.int32)

    def f_fused(x, h, scale, bias):
        return jnp.sum(
            fused_dropout_add_ln(x, h, scale, bias, seed, 0.0, 1e-12, INTERP)
            * jnp.cos(jnp.arange(D)))

    def f_ref(x, h, scale, bias):
        return jnp.sum(add_ln_reference(x, h, scale, bias, 1e-12)
                       * jnp.cos(jnp.arange(D)))

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, h, scale, bias)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, h, scale, bias)
    for a, b, name in zip(g_fused, g_ref, ("dx", "dh", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=name)


def test_plm_fused_ln_matches_unfused(rng):
    """A tiny PLM with fused_ln produces the same forward as the unfused
    path (deterministic, rate irrelevant)."""
    import dataclasses as dc

    from miner_tpu.models.plm import PLMConfig, TransformerPLM
    from miner_tpu.ops import common

    cfg = PLMConfig.tiny()
    ids = jnp.asarray(rng.integers(1, 500, size=(4, 16)).astype(np.int32))
    mask = jnp.ones((4, 16), jnp.int32)

    plm_a = TransformerPLM(cfg)
    params = plm_a.init(jax.random.PRNGKey(0), ids, mask)
    out_a = plm_a.apply(params, ids, mask)

    # force the fused path on CPU by monkeypatching on_tpu + interpret mode
    orig = common.on_tpu
    common.on_tpu = lambda: True
    import miner_tpu.ops.add_ln as add_ln_mod
    orig_call = add_ln_mod._call_fwd
    add_ln_mod_call_bwd = add_ln_mod._call_bwd
    add_ln_mod._call_fwd = lambda *a: orig_call(*a[:-1], True)
    try:
        plm_b = TransformerPLM(dc.replace(cfg, fused_ln=True))
        out_b = plm_b.apply(params, ids, mask)
    finally:
        common.on_tpu = orig
        add_ln_mod._call_fwd = orig_call
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=2e-4, atol=2e-4)


def test_multiblock_param_grad_accumulation(inputs):
    """dgamma/dbeta accumulate across grid steps (constant-index output
    block): forcing 4 blocks must give the same grads as 1 block."""
    from miner_tpu.ops import add_ln as m

    x, h, scale, bias = inputs
    seed = jnp.zeros((1,), jnp.int32)
    dy = jnp.asarray(np.random.default_rng(1).normal(size=(T, D)).astype(np.float32))
    one = m._call_bwd(x, h, scale, seed, dy, 0.0, 1e-12, INTERP, max_rows=T)
    four = m._call_bwd(x, h, scale, seed, dy, 0.0, 1e-12, INTERP, max_rows=T // 4)
    for a, b, name in zip(one, four, ("dx", "dh", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=name)
