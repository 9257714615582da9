"""Validate the fused dropout+add+LN kernel compiled on the real TPU:
dropout determinism, mean preservation, and backward mask-regeneration via
an explicit-mask XLA reference (same method as validate_mha_tpu.py)."""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from miner_tpu.ops.add_ln import (  # noqa: E402
    _pick_block, _threshold, fused_dropout_add_ln)

T, D = 512, 768
RATE = 0.1
EPS = 1e-12


def get_keep(seed):
    BT = _pick_block(T)

    def kern(seed_ref, out_ref):
        n = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], n)
        bits = pltpu.bitcast(pltpu.prng_random_bits((BT, D)), jnp.uint32)
        out_ref[...] = (bits >= jnp.uint32(_threshold(RATE))).astype(jnp.int32)

    return pl.pallas_call(
        kern, grid=(T // BT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((BT, D), lambda n: (n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.int32),
    )(seed)


def ref_with_mask(x, h, scale, bias, keep):
    hd = jnp.where(keep.astype(bool), h / (1 - RATE), 0.0)
    s = (x + hd).astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    xhat = (s - mu) * jax.lax.rsqrt(var + EPS)
    return xhat * scale + bias


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1 + 1.0)
    bias = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    seed = jnp.asarray([11], jnp.int32)

    a = fused_dropout_add_ln(x, h, scale, bias, seed, RATE, EPS)
    b = fused_dropout_add_ln(x, h, scale, bias, seed, RATE, EPS)
    c = fused_dropout_add_ln(x, h, scale, bias,
                             jnp.asarray([12], jnp.int32), RATE, EPS)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0
    assert float(jnp.max(jnp.abs(a - c))) > 1e-6
    print("determinism ok")

    keep = get_keep(seed)
    kf = float(jnp.mean(keep.astype(jnp.float32)))
    print(f"keep fraction: {kf:.4f} (expect {1 - RATE})")
    assert abs(kf - (1 - RATE)) < 0.01

    r = ref_with_mask(x, h, scale, bias, keep)
    fe = float(jnp.max(jnp.abs(a - r)))
    print(f"fwd max err vs explicit-mask ref: {fe:.2e}")
    assert fe < 1e-4

    w = jnp.cos(jnp.arange(D, dtype=jnp.float32))
    g_f = jax.grad(
        lambda x, h, s2, b2: jnp.sum(
            fused_dropout_add_ln(x, h, s2, b2, seed, RATE, EPS) * w),
        argnums=(0, 1, 2, 3))(x, h, scale, bias)
    g_r = jax.grad(
        lambda x, h, s2, b2: jnp.sum(ref_with_mask(x, h, s2, b2, keep) * w),
        argnums=(0, 1, 2, 3))(x, h, scale, bias)
    for gf, gr, name in zip(g_f, g_r, ("dx", "dh", "dscale", "dbias")):
        e = float(jnp.max(jnp.abs(gf - gr)))
        print(f"{name} max err: {e:.2e}")
        assert e < 2e-3, name
    print("ALL ADD_LN TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
