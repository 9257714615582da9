"""Run the fused-MHA kernel checks compiled on the real TPU (the pytest suite
runs them in interpret mode on CPU, where the Pallas PRNG is unavailable)."""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from miner_tpu.ops.mha import fused_mha, mha_reference  # noqa: E402

N, L, H, Dh = 3, 128, 4, 32
D = H * Dh


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(N, L, 3 * D)).astype(np.float32)) * 0.3
    mask_np = np.ones((N, L), np.int32)
    mask_np[1, 100:] = 0
    mask = jnp.asarray(mask_np)
    zero = jnp.zeros((1,), jnp.int32)

    out = fused_mha(qkv, mask, zero, H, 0.0)
    ref = mha_reference(qkv, mask, H)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"fwd max err (rate=0): {err:.2e}")
    assert err < 5e-5

    g_fused = jax.grad(lambda q: jnp.sum(fused_mha(q, mask, zero, H, 0.0) ** 2))(qkv)
    g_ref = jax.grad(lambda q: jnp.sum(mha_reference(q, mask, H) ** 2))(qkv)
    gerr = float(jnp.max(jnp.abs(g_fused - g_ref)))
    print(f"bwd max err (rate=0): {gerr:.2e}")
    assert gerr < 5e-4

    s1, s2 = jnp.asarray([7], jnp.int32), jnp.asarray([8], jnp.int32)
    a = fused_mha(qkv, mask, s1, H, 0.5)
    b = fused_mha(qkv, mask, s1, H, 0.5)
    c = fused_mha(qkv, mask, s2, H, 0.5)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0, "same seed must be identical"
    assert float(jnp.max(jnp.abs(a - c))) > 1e-6, "different seed must differ"
    print("dropout determinism ok")

    outs = [np.asarray(fused_mha(qkv, mask, jnp.asarray([s], jnp.int32), H, 0.3),
                       np.float64) for s in range(8)]
    mean = np.stack(outs).mean(0)
    refn = np.asarray(ref, np.float64)
    bias = np.abs(mean - refn).mean() / (np.abs(refn).mean() + 1)
    print(f"dropout mean bias: {bias:.4f}")
    assert bias < 0.05

    # Strong check: extract the kernel's actual dropout keep-mask via a
    # debug kernel seeded identically, then compare fused fwd+bwd against
    # XLA autodiff of a reference that applies that explicit mask.
    # (A finite-difference check is hopeless here: TPU f32 matmuls run at
    # default precision ~bf16, so the primal is too noisy for FD.)
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from miner_tpu.ops.mha import NEG_INF, _dropout_threshold

    rate = 0.5
    seed = jnp.asarray([3], jnp.int32)

    def keep_kernel(seed_ref, out_ref):
        nn = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], nn)
        thresh = _dropout_threshold(rate)
        for h in range(H):
            bits = pltpu.bitcast(pltpu.prng_random_bits((L, L)), jnp.uint32)
            out_ref[0, h] = (bits >= jnp.uint32(thresh)).astype(jnp.int32)

    keep = pl.pallas_call(
        keep_kernel, grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, H, L, L), lambda nn: (nn, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, L, L), jnp.int32),
    )(seed)

    def ref_with_mask(q_kv):
        q = q_kv[..., :D].reshape(N, L, H, Dh)
        k = q_kv[..., D:2 * D].reshape(N, L, H, Dh)
        v = q_kv[..., 2 * D:].reshape(N, L, H, Dh)
        scale = 1.0 / jnp.sqrt(jnp.float32(Dh))
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        s = jnp.where(mask.astype(bool)[:, None, None, :], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(keep.astype(bool), p / (1 - rate), 0.0).astype(q_kv.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(N, L, D)

    out_f = fused_mha(qkv, mask, seed, H, rate)
    out_r = ref_with_mask(qkv)
    fe = float(jnp.max(jnp.abs(out_f - out_r)))
    print(f"dropout fwd max err vs explicit-mask ref: {fe:.2e}")
    assert fe < 5e-5

    g_f = jax.grad(lambda q: jnp.sum(fused_mha(q, mask, seed, H, rate) ** 2))(qkv)
    g_r = jax.grad(lambda q: jnp.sum(ref_with_mask(q) ** 2))(qkv)
    ge = float(jnp.max(jnp.abs(g_f - g_r)))
    print(f"dropout bwd max err vs explicit-mask ref: {ge:.2e}")
    assert ge < 5e-4, "backward must regenerate the forward dropout mask"
    print("ALL MHA TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
