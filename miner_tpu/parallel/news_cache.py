"""Sharded news-embedding inference cache.

A first-class component with no reference counterpart (the reference
re-encodes every news item on every occurrence; SURVEY.md §2.6): the trained
news encoder runs once over the whole corpus, producing a (V*N, D) embedding
table that is row-sharded over the mesh's ``table`` axis.  Downstream lookups
happen at impression-batch granularity — XLA turns the sharded gather into
the appropriate ICI collectives (all-gather of the request indices to table
shards, then an exchange of the hit rows back to the data-parallel owners).

Used by:
  * cached evaluation (Trainer._run_eval with ``cached=True``): eval needs
    zero PLM calls per impression — interests come from poly-attention over
    cached history rows, scores from cached candidate rows;
  * serving-style scoring via the fused Pallas lookup+score kernel on a
    single chip (miner_tpu.ops.lookup_score).

Refresh policy: the cache is rebuilt from the current parameters whenever the
caller asks (e.g. before each eval); staleness semantics during training are
therefore explicit at the call site, a question the reference never had to
answer.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miner_tpu.data.device_table import NewsTable
from miner_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS
from miner_tpu.utils import round_up


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Int8Rows:
    """Per-row symmetric int8 quantization of a (R, D) embedding table.

    ``values[r] = round(emb[r] / scales[r])`` with ``scales[r] =
    absmax(emb[r]) / 127`` — 4x less serving HBM than fp32 (2x vs bf16),
    which at production corpus scale (millions of news x 768 dims) is the
    difference between a corpus fitting one chip or not.  Scoring reads
    int8 bytes from HBM and applies the per-row scale to the einsum OUTPUT
    (score is linear in the row), so the bandwidth saving survives the hot
    path; no dequantized corpus copy is ever materialized.  A pytree node,
    so it passes straight through ``jax.jit`` argument lists wherever a raw
    embedding array would.
    """

    values: jax.Array  # (R, D) int8
    scales: jax.Array  # (R, 1) f32
    dequant_dtype: str = "float32"  # static: dtype gathered rows dequant to

    @property
    def shape(self):
        return self.values.shape

    def tree_flatten(self):
        return (self.values, self.scales), self.dequant_dtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def quantize_rows(emb: jax.Array, dequant_dtype=None) -> Int8Rows:
    """Quantize a (R, D) table to :class:`Int8Rows` (per-row absmax)."""
    f = emb.astype(jnp.float32)
    scales = jnp.max(jnp.abs(f), axis=1, keepdims=True) / 127.0
    scales = jnp.where(scales == 0.0, 1.0, scales)  # all-zero (pad) rows
    values = jnp.clip(jnp.round(f / scales), -127, 127).astype(jnp.int8)
    return Int8Rows(values, scales,
                    str(dequant_dtype if dequant_dtype is not None
                        else emb.dtype))


def gather_rows(emb, idx: jax.Array) -> jax.Array:
    """Gather rows from a raw (R, D) array or an :class:`Int8Rows` table,
    dequantizing the latter to its ``dequant_dtype``."""
    if isinstance(emb, Int8Rows):
        dt = jnp.dtype(emb.dequant_dtype)
        q = jnp.take(emb.values, idx, axis=0).astype(dt)
        s = jnp.take(emb.scales, idx, axis=0).astype(dt)
        return q * s
    return jnp.take(emb, idx, axis=0)


@dataclasses.dataclass
class NewsEmbeddingCache:
    embeddings: jax.Array  # (R, D), row-sharded on `table` when mesh given
    category: jax.Array  # (R,)
    category_pad_id: int
    mesh: Optional[Mesh] = None
    _scoring_view: Optional[jax.Array] = dataclasses.field(
        default=None, repr=False)

    @property
    def scoring_embeddings(self) -> jax.Array:
        """The embeddings as consumed by the fused lookup+score kernel,
        which routes f32 through its per-row DMA gather (16-bit (1, D) VMEM
        slices are untileable on TPU).  Cast ONCE per cache build and
        memoized — casting inside the jitted scoring program would
        materialize an O(rows x dim) convert on EVERY eval/serving batch,
        scaling per-batch cost with corpus size.  Gated on the kernel's own
        runnability condition (single-shard TPU cache, lane-aligned dim) —
        anywhere the kernel would fall back to the XLA reference the
        original array passes through, so no second corpus copy is pinned
        for nothing."""
        from miner_tpu.ops.common import on_tpu
        from miner_tpu.ops.lookup_score import lookup_score_available

        if (self.quantized
                or self.mesh is not None
                or self.embeddings.dtype == jnp.float32
                or not on_tpu()
                or not lookup_score_available(self.dim)):
            return self.embeddings
        if self._scoring_view is None:
            self._scoring_view = self.embeddings.astype(jnp.float32)
        return self._scoring_view

    @property
    def quantized(self) -> bool:
        return isinstance(self.embeddings, Int8Rows)

    def quantize(self) -> "NewsEmbeddingCache":
        """int8 view of this cache (no-op if already quantized)."""
        if self.quantized:
            return self
        return dataclasses.replace(
            self, embeddings=quantize_rows(self.embeddings),
            _scoring_view=None)

    @property
    def num_rows(self) -> int:
        return self.embeddings.shape[0]

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    def lookup(self, idx: jax.Array) -> jax.Array:
        """Gather embedding rows; under a mesh the gather crosses shards."""
        return gather_rows(self.embeddings, idx)

    def lookup_category(self, idx: jax.Array) -> jax.Array:
        return jnp.take(self.category, idx, axis=0)

    def score(self, cand_idx: jax.Array, interests: jax.Array,
              fused: bool = False) -> jax.Array:
        """(B, C, K) per-interest scores for candidate rows.

        ``fused=True`` uses the Pallas lookup+score kernel (single-shard
        non-quantized caches only — the kernel DMAs f32 rows from local
        HBM)."""
        if fused and self.mesh is None and not self.quantized:
            from miner_tpu.ops.lookup_score import lookup_score_fused

            return lookup_score_fused(self.scoring_embeddings, cand_idx,
                                      interests)
        from miner_tpu.ops.lookup_score import lookup_score_reference

        return lookup_score_reference(self.embeddings, cand_idx, interests)


def _place_on_mesh(emb: jax.Array, category: jax.Array,
                   mesh: Optional[Mesh]):
    """Row-shard (emb, category) over the mesh's ``table`` axis, padding the
    row count up to the shard count; no-op without a non-trivial mesh."""
    if mesh is None or mesh.shape.get(TABLE_AXIS, 1) <= 1:
        return emb, category
    R = emb.shape[0]
    shards = mesh.shape[TABLE_AXIS]
    R_pad = round_up(R, shards)
    row_sharding = NamedSharding(mesh, P(TABLE_AXIS, None))
    if isinstance(emb, Int8Rows):
        values, scales = emb.values, emb.scales
        if R_pad != R:
            values = jnp.pad(values, ((0, R_pad - R), (0, 0)))
            # padding rows keep scale 1 (never gathered; avoids 0-div noise)
            scales = jnp.pad(scales, ((0, R_pad - R), (0, 0)),
                             constant_values=1.0)
        emb = Int8Rows(jax.device_put(values, row_sharding),
                       jax.device_put(scales, row_sharding),
                       emb.dequant_dtype)
    else:
        if R_pad != R:
            emb = jnp.pad(emb, ((0, R_pad - R), (0, 0)))
        emb = jax.device_put(emb, row_sharding)
    if R_pad != R:
        category = jnp.pad(category, (0, R_pad - R))
    category = jax.device_put(category, NamedSharding(mesh, P(TABLE_AXIS)))
    return emb, category


def save_cache(cache: NewsEmbeddingCache, path: str, num_rows: int,
               fingerprint: dict) -> None:
    """Persist the corpus cache so a serving restart skips the corpus
    encode entirely (at MIND-large scale the one-time PLM pass over every
    news item dominates server startup).  Stored host-side as ``.npz``;
    only the TRUE corpus rows are written (a table-sharded cache carries
    zero rows padding the corpus to the shard count — re-added at load
    placement).  bfloat16 has no stable numpy serialization, so raw bits
    travel as uint16 with the dtype recorded in the metadata.  The caller's
    ``fingerprint`` (checkpoint + corpus identity) gates ``load_cache``."""
    import json

    cat = np.asarray(jax.device_get(cache.category))[:num_rows]
    arrays = {}
    if cache.quantized:
        q: Int8Rows = cache.embeddings
        arrays["embeddings"] = np.asarray(jax.device_get(q.values))[:num_rows]
        arrays["scales"] = np.asarray(jax.device_get(q.scales))[:num_rows]
        dtype = f"int8:{q.dequant_dtype}"
    else:
        emb = np.asarray(jax.device_get(cache.embeddings))[:num_rows]
        dtype = str(emb.dtype)
        if emb.dtype not in (np.float32, np.float16):
            emb = emb.view(np.uint16)  # bf16 raw bits
        arrays["embeddings"] = emb
    meta = dict(fingerprint, dtype=dtype, num_rows=int(num_rows),
                category_pad_id=int(cache.category_pad_id))
    tmp = path + ".tmp"
    np.savez(tmp, category=cat,
             meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
             **arrays)
    # np.savez appends .npz to names without it; normalize then rename
    if not tmp.endswith(".npz"):
        tmp += ".npz"
    import os

    os.replace(tmp, path)


def load_cache(path: str, fingerprint: dict,
               mesh: Optional[Mesh] = None) -> Optional[NewsEmbeddingCache]:
    """Load a cache persisted by :func:`save_cache`; returns None when the
    file is absent or its fingerprint does not match (stale checkpoint,
    different corpus/tokenization — the caller falls back to a fresh
    encode)."""
    import json
    import os

    import ml_dtypes

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        stored = {k: meta.get(k) for k in fingerprint}
        if stored != dict(fingerprint):
            return None
        emb, cat = z["embeddings"], z["category"]
        scales = z["scales"] if "scales" in z.files else None
    if meta["dtype"].startswith("int8:"):
        emb = Int8Rows(jnp.asarray(emb), jnp.asarray(scales),
                       meta["dtype"].split(":", 1)[1])
    elif meta["dtype"] not in ("float32", "float16"):
        emb = emb.view(ml_dtypes.bfloat16 if meta["dtype"] == "bfloat16"
                       else np.dtype(meta["dtype"]))
        emb = jnp.asarray(emb)
    else:
        emb = jnp.asarray(emb)
    emb, cat = _place_on_mesh(emb, jnp.asarray(cat), mesh)
    return NewsEmbeddingCache(
        embeddings=emb, category=cat,
        category_pad_id=int(meta["category_pad_id"]), mesh=mesh,
    )


class CacheFiller:
    """One-dispatch corpus fill: the whole news table is encoded inside a
    single jitted ``lax.scan`` over fixed-size chunks.

    ``build_cache`` dispatches each chunk's gather/mask/encode as separate
    eager ops — fine on a local backend, but through the axon remote-execution
    tunnel every eager dispatch pays a round trip (measured: ~990s for a 20k
    x roberta-base fill that is ~8s of FLOPs).  Constructing the filler once
    and calling ``fill(params, table)`` per refresh keeps it at ONE remote
    call, and rebuilds from updated parameters reuse the same compiled
    program.
    """

    def __init__(self, encode_fn: Callable[..., jax.Array],
                 batch_size: int = 512):
        self.encode_fn = encode_fn  # (params, title, tmask, sapo, smask)
        self.batch_size = batch_size
        # pad_token_id is static: it never changes for a table, and a
        # host-local device scalar would not be a valid global array under a
        # multi-process mesh
        self._fill_jit = jax.jit(self._fill, static_argnums=(3,))

    def _fill(self, params, title, sapo, pad_token_id):
        R = title.shape[0]
        bs = self.batch_size
        n_batches = round_up(R, bs) // bs
        starts = jnp.arange(n_batches, dtype=jnp.int32) * bs

        def body(_, start):
            idx = start + jnp.arange(bs, dtype=jnp.int32)
            idx = jnp.where(idx < R, idx, 0)
            t = jnp.take(title, idx, axis=0)
            tm = (t != pad_token_id).astype(jnp.int32)
            if sapo is not None:
                s = jnp.take(sapo, idx, axis=0)
                sm = (s != pad_token_id).astype(jnp.int32)
            else:
                s = sm = None
            return None, self.encode_fn(params, t, tm, s, sm)

        _, embs = jax.lax.scan(body, None, starts)
        return embs.reshape(n_batches * bs, -1)[:R]

    def fill(self, params, table: NewsTable,
             mesh: Optional[Mesh] = None) -> NewsEmbeddingCache:
        emb = self._fill_jit(params, table.title, table.sapo,
                             int(table.pad_token_id))
        emb, category = _place_on_mesh(emb, table.category, mesh)
        return NewsEmbeddingCache(
            embeddings=emb,
            category=category,
            category_pad_id=table.category_pad_id,
            mesh=mesh,
        )


def build_cache(
    encode_fn: Callable[..., jax.Array],
    table: NewsTable,
    batch_size: int = 512,
    mesh: Optional[Mesh] = None,
) -> NewsEmbeddingCache:
    """Run ``encode_fn(title, title_mask, sapo, sapo_mask) -> (B, D)`` over the
    whole news table in fixed-size jitted batches.

    The corpus is padded up to a multiple of ``batch_size`` (extra rows reuse
    row 0 = the pad news) so every call sees one static shape.  For repeated
    rebuilds from updated parameters use ``CacheFiller`` — this per-chunk
    path re-jits per call and dispatches each chunk separately.
    """
    R = table.title.shape[0]
    padded = round_up(R, batch_size)
    n_batches = padded // batch_size

    encode = jax.jit(encode_fn)
    chunks = []
    for b in range(n_batches):
        start = b * batch_size
        idx = np.arange(start, start + batch_size)
        idx = np.where(idx < R, idx, 0).astype(np.int32)
        idx = jnp.asarray(idx)
        title = jnp.take(table.title, idx, axis=0)
        tmask = (title != table.pad_token_id).astype(jnp.int32)
        if table.sapo is not None:
            sapo = jnp.take(table.sapo, idx, axis=0)
            smask = (sapo != table.pad_token_id).astype(jnp.int32)
        else:
            sapo = smask = None
        chunks.append(encode(title, tmask, sapo, smask))
    emb = jnp.concatenate(chunks, axis=0)[:R]
    emb, category = _place_on_mesh(emb, table.category, mesh)
    return NewsEmbeddingCache(
        embeddings=emb,
        category=category,
        category_pad_id=table.category_pad_id,
        mesh=mesh,
    )
