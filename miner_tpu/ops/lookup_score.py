"""Fused embedding lookup + candidate scoring kernel (Pallas TPU) + reference.

The serving/eval hot path: given a (N, D) news-embedding cache, (B, C)
candidate indices, and (B, K, D) user interest vectors, produce per-interest
matching scores (B, C, K) — the ``candidate_repr @ interests^T`` of the
reference's click predictor (reference: src/model/model.py:126-127) with the
gather fused in.

Kernel design: the cache stays in HBM/ANY; candidate indices arrive via
scalar prefetch so each grid step can DMA exactly the C rows it needs into a
VMEM scratch buffer (double-buffered across the C loop), then one MXU matmul
scores them against the batch row's interests.  HBM traffic is C*D reads
instead of materializing a (B, C, D) gathered tensor in HBM and reading it
back.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miner_tpu.ops.common import force_interpret, on_tpu


def lookup_score_reference(
    cache,  # (N, D) array, or parallel.news_cache.Int8Rows
    cand_idx: jax.Array,  # (B, C)
    interests: jax.Array,  # (B, K, D)
) -> jax.Array:
    from miner_tpu.parallel.news_cache import Int8Rows

    if isinstance(cache, Int8Rows):
        # score is linear in the row, so the per-row scale applies to the
        # einsum OUTPUT — HBM reads stay int8 and no dequantized (B, C, D)
        # gather is materialized
        dt = jnp.dtype(cache.dequant_dtype)
        q = jnp.take(cache.values, cand_idx, axis=0)  # (B, C, D) int8
        s = jnp.take(cache.scales, cand_idx, axis=0)  # (B, C, 1)
        out = jnp.einsum("bcd,bkd->bck", q.astype(dt), interests.astype(dt))
        return out * s.astype(dt)
    cand = jnp.take(cache, cand_idx, axis=0)  # (B, C, D)
    return jnp.einsum("bcd,bkd->bck", cand, interests.astype(cand.dtype))


_GROUP = 8  # candidate rows per DMA group (sublane-aligned output stores)


def _lookup_kernel(idx_ref, interests_ref, cache_ref, out_ref, rows, sem):
    # cache_ref is (N, 1, D) so a single-row gather DMA slices only the
    # untiled leading dim (HBM tiling applies to the trailing (1, D) dims).
    # Candidates are processed in groups of 8: Mosaic requires output
    # vector stores at sublane offsets provably divisible by 8 (a per-row
    # dynamic store does not compile on hardware), and the (8, D) x (K, D)^T
    # group matmul uses the MXU far better than row-at-a-time anyway.
    b = pl.program_id(0)
    C = out_ref.shape[0]  # padded to a multiple of _GROUP by the caller
    G = C // _GROUP

    # rows is (2 * _GROUP, 1, D): slot/group indexing stays on the untiled
    # leading dim (slicing inside the tiled (1, D) pair does not compile)
    def get_dma(slot, g, j):
        return pltpu.make_async_copy(
            cache_ref.at[idx_ref[b, g * _GROUP + j]],
            rows.at[slot * _GROUP + j],
            sem.at[slot, j],
        )

    def start_group(slot, g):
        for j in range(_GROUP):
            get_dma(slot, g, j).start()

    start_group(0, 0)

    def body(g, _):
        slot = g % 2

        @pl.when(g + 1 < G)
        def _():
            start_group((g + 1) % 2, g + 1)

        for j in range(_GROUP):
            get_dma(slot, g, j).wait()
        group = rows[pl.ds(slot * _GROUP, _GROUP)].reshape(
            _GROUP, rows.shape[-1])
        scores = jax.lax.dot_general(
            group,
            interests_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[pl.ds(g * _GROUP, _GROUP), :] = scores.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, G, body, 0)


def _lookup_pallas(cache, cand_idx, interests, interpret):
    B, C = cand_idx.shape
    K, D = interests.shape[1], interests.shape[2]
    N = cache.shape[0]
    cache3 = cache.reshape(N, 1, D)
    # Pad C to the DMA-group size (extra rows re-gather row 0, sliced off)
    # and K up to the 128-lane tile.
    C_pad = -(-C // _GROUP) * _GROUP
    if C_pad != C:
        cand_idx = jnp.pad(cand_idx, ((0, 0), (0, C_pad - C)))
    K_pad = max(128, -(-K // 128) * 128)
    if K_pad != K:
        interests = jnp.pad(interests, ((0, 0), (0, K_pad - K), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cand_idx
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K_pad, D), lambda b, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # cache stays off-chip
        ],
        out_specs=pl.BlockSpec((1, C_pad, K_pad), lambda b, idx: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * _GROUP, 1, D), cache.dtype),
            pltpu.SemaphoreType.DMA((2, _GROUP)),
        ],
    )

    def kernel(idx_ref, interests_ref, cache_ref, out_ref, rows, sem):
        # block shapes carry a leading 1 (batch); index it away.
        _lookup_kernel(
            idx_ref, interests_ref.at[0], cache_ref, out_ref.at[0], rows, sem
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C_pad, K_pad), interests.dtype),
        grid_spec=grid_spec,
        interpret=interpret or force_interpret(),
    )(cand_idx, interests, cache3)
    return out[:, :C, :K]


def lookup_score_available(dim: int) -> bool:
    """The kernel's per-row DMA slices the lane dim: D must be a multiple of
    the 128-lane tile (Mosaic rejects smaller slices)."""
    return dim % 128 == 0


def lookup_score_fused(cache, cand_idx, interests, interpret: bool = False):
    if (interpret or on_tpu()) and lookup_score_available(cache.shape[1]):
        # f32 through the kernel: Mosaic cannot tile the (1, D) per-row
        # VMEM slices for 16-bit types (sublane tile 2 > slice), the MXU
        # accumulates in f32 regardless, and caches are small (N x D)
        out_dtype = interests.dtype
        out = _lookup_pallas(
            cache.astype(jnp.float32), cand_idx,
            interests.astype(jnp.float32), interpret,
        )
        return out.astype(out_dtype)
    return lookup_score_reference(cache, cand_idx, interests)
