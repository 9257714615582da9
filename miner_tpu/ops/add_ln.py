"""Fused dropout + residual-add + LayerNorm (Pallas TPU) with custom VJP.

The post-LN transformer applies ``y = LN(x + dropout(h))`` twice per layer
(reference math: HF BertSelfOutput / BertOutput). Left to XLA this chain is
~25% of the Miner train step (profiled): fp32 mean/var reductions, the
normalize apply, per-feature dgamma/dbeta reductions, and the dropout
mask RNG each make separate passes over the (tokens, 768) activations.

This kernel does the whole chain in one pass per token block:

  forward : keep = bits >= thresh;  s = x + keep * h / keep_prob
            mu, rstd over features (fp32);  y = (s - mu) * rstd * gamma + beta
  backward: regenerate keep from the same seed (nothing random is stored),
            recompute s, mu, rstd, xhat;  with g = dy * gamma:
              ds = rstd * (g - mean(g) - xhat * mean(g * xhat))
              dx = ds;  dh = keep * ds / keep_prob
              dgamma += sum(dy * xhat);  dbeta += sum(dy)   (per-block
            partials, summed by XLA afterwards).

Parameter layout matches ``nn.LayerNorm`` ({scale, bias}) so checkpoints are
interchangeable with the unfused path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miner_tpu.ops.common import force_interpret


def _threshold(rate: float) -> int:
    return min(int(rate * 4294967296.0), 4294967295)


def add_ln_reference(x, h, scale, bias, eps: float = 1e-12):
    """XLA reference at dropout rate 0: LN(x + h) with fp32 statistics."""
    s = (x + h).astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    xhat = (s - mu) * jax.lax.rsqrt(var + eps)
    return (xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _fwd_kernel(seed_ref, x_ref, h_ref, scale_ref, bias_ref, y_ref, *,
                rate: float, eps: float):
    n = pl.program_id(0)
    dropping = rate > 0.0
    h = h_ref[...].astype(jnp.float32)
    if dropping:
        pltpu.prng_seed(seed_ref[0], n)
        bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
        keep = bits >= jnp.uint32(_threshold(rate))
        h = jnp.where(keep, h * (1.0 / (1.0 - rate)), 0.0)
    s = x_ref[...].astype(jnp.float32) + h
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    xhat = (s - mu) * jax.lax.rsqrt(var + eps)
    y = xhat * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, h_ref, scale_ref, dy_ref,
                dx_ref, dh_ref, dscale_ref, dbias_ref, *, rate: float,
                eps: float):
    n = pl.program_id(0)
    dropping = rate > 0.0
    h = h_ref[...].astype(jnp.float32)
    if dropping:
        pltpu.prng_seed(seed_ref[0], n)  # same stream as forward
        bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
        keep = bits >= jnp.uint32(_threshold(rate))
        inv = 1.0 / (1.0 - rate)
        h = jnp.where(keep, h * inv, 0.0)
    s = x_ref[...].astype(jnp.float32) + h
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (s - mu) * rstd

    dy = dy_ref[...].astype(jnp.float32)
    g = dy * scale_ref[...].astype(jnp.float32)
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gxm = jnp.mean(g * xhat, axis=-1, keepdims=True)
    ds = rstd * (g - gm - xhat * gxm)
    dx_ref[...] = ds.astype(dx_ref.dtype)
    if dropping:
        dh_ref[...] = jnp.where(keep, ds * inv, 0.0).astype(dh_ref.dtype)
    else:
        dh_ref[...] = ds.astype(dh_ref.dtype)
    # dgamma/dbeta: accumulate into a single (8, D) block shared by all grid
    # steps (constant index map keeps it resident in VMEM; the sequential TPU
    # grid makes += well-defined); row 0 carries the sums.
    @pl.when(n == 0)
    def _():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dscale_ref[0:1, :] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias_ref[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)


def _pick_block(T: int, max_rows: int = 512) -> int:
    """Largest 8-aligned block dividing T. Callers (plm._FusedAddLN) pad the
    row count to a multiple of 8, so this never degenerates to a full-array
    block (which would overflow VMEM at real geometries)."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if cand <= max_rows and T % cand == 0:
            return cand
    raise ValueError(
        f"fused add_ln requires the row count to be a multiple of 8, got {T}"
    )


def _call_fwd(x, h, scale, bias, seed, rate, eps, interpret, max_rows=512):
    T, D = x.shape
    BT = _pick_block(T, max_rows)
    kern = functools.partial(_fwd_kernel, rate=rate, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(T // BT,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BT, D), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, D), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, D), lambda n: (n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
        interpret=interpret or force_interpret(),
    )(seed, x, h, scale.reshape(1, D), bias.reshape(1, D))


def _call_bwd(x, h, scale, seed, dy, rate, eps, interpret, max_rows=512):
    T, D = x.shape
    BT = _pick_block(T, max_rows)
    nb = T // BT
    kern = functools.partial(_bwd_kernel, rate=rate, eps=eps)
    dx, dh, dscale_p, dbias_p = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BT, D), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, D), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, D), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BT, D), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, D), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, D), x.dtype),
            jax.ShapeDtypeStruct((T, D), x.dtype),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
        ),
        interpret=interpret or force_interpret(),
    )(seed, x, h, scale.reshape(1, D), dy)
    return dx, dh, jnp.sum(dscale_p, axis=0), jnp.sum(dbias_p, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_dropout_add_ln(x, h, scale, bias, seed, rate: float = 0.0,
                         eps: float = 1e-12, interpret: bool = False):
    """y = LayerNorm(x + dropout(h)) over the last axis. x, h: (T, D);
    scale, bias: (D,); seed: (1,) int32 (unused at rate 0)."""
    return _call_fwd(x, h, scale, bias, seed, rate, eps, interpret)


def _fused_fwd(x, h, scale, bias, seed, rate, eps, interpret):
    y = _call_fwd(x, h, scale, bias, seed, rate, eps, interpret)
    return y, (x, h, scale, seed)


def _fused_bwd(rate, eps, interpret, res, dy):
    x, h, scale, seed = res
    dx, dh, dscale, dbias = _call_bwd(x, h, scale, seed,
                                      dy.astype(x.dtype), rate, eps, interpret)
    return dx, dh, dscale.astype(scale.dtype), dbias.astype(scale.dtype), None


fused_dropout_add_ln.defvjp(_fused_fwd, _fused_bwd)
