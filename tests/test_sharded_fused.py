"""Multi-device fused-kernel path: with ``PLMConfig.mesh`` set, the PLM wraps
its Pallas kernels in jax.shard_map over the data axis. Forward AND parameter
gradients must match the unfused global computation (catches the classic
missing-psum-on-replicated-cotangents pitfall)."""
import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from miner_tpu.models.plm import PLMConfig, TransformerPLM
from miner_tpu.ops import common
from miner_tpu.parallel.mesh import MeshConfig, make_mesh


@pytest.fixture
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(MeshConfig(data=8, table=1))


def _force_interpret(monkeypatch):
    import miner_tpu.ops.add_ln as add_ln_mod
    import miner_tpu.ops.mha as mha_mod

    monkeypatch.setattr(common, "on_tpu", lambda: True)
    orig_mha_f = mha_mod._call_fwd
    orig_mha_b = mha_mod._call_bwd
    monkeypatch.setattr(
        mha_mod, "_call_fwd",
        lambda qkv, m, s, h, r, interp, seqs=1: orig_mha_f(qkv, m, s, h, r, True, seqs))
    monkeypatch.setattr(
        mha_mod, "_call_bwd",
        lambda qkv, m, s, g, h, r, interp, seqs=1: orig_mha_b(qkv, m, s, g, h, r, True, seqs))
    orig_ln_f = add_ln_mod._call_fwd
    orig_ln_b = add_ln_mod._call_bwd
    monkeypatch.setattr(
        add_ln_mod, "_call_fwd",
        lambda x, hh, sc, b, s, r, e, interp, mr=512: orig_ln_f(x, hh, sc, b, s, r, e, True, mr))
    monkeypatch.setattr(
        add_ln_mod, "_call_bwd",
        lambda x, hh, sc, s, dy, r, e, interp, mr=512: orig_ln_b(x, hh, sc, s, dy, r, e, True, mr))


def test_sharded_fused_plm_matches_unfused(rng, mesh8, monkeypatch):
    cfg = PLMConfig.tiny()
    B, L = 16, 32  # pack=4 path, batch shards 8 ways
    ids = jnp.asarray(rng.integers(1, 500, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)

    plm_ref = TransformerPLM(cfg)
    params = plm_ref.init(jax.random.PRNGKey(0), ids, mask)

    def loss_ref(p):
        out = plm_ref.apply(p, ids, mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)

    _force_interpret(monkeypatch)
    plm_fused = TransformerPLM(
        dc.replace(cfg, fused_attention=True, fused_ln=True, mesh=mesh8))
    sharded_ids = jax.device_put(ids, NamedSharding(mesh8, P("data")))
    sharded_mask = jax.device_put(mask, NamedSharding(mesh8, P("data")))

    def loss_fused(p):
        out = plm_fused.apply(p, sharded_ids, sharded_mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l_f, g_f = jax.jit(jax.value_and_grad(loss_fused))(params)

    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=2e-4)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3,
            err_msg=jax.tree_util.keystr(pa))
