"""NamedSharding helpers: batch on ``data``, tables on ``table``, params replicated.

XLA inserts the collectives — the framework only annotates placements
(the scaling-book recipe: pick a mesh, annotate shardings, let the compiler
do the rest).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miner_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim on the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def table_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Row-shard a (rows, ...) table on the table axis."""
    return NamedSharding(mesh, P(TABLE_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the batch dim sharded on ``data``.

    Scalar leaves (e.g. ``valid``) are replicated.
    """

    def put(x):
        import numpy as np

        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicate(mesh))
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)
