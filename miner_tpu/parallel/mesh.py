"""Device mesh construction.

The framework uses a 3-D logical mesh:

  * ``data``  — batch (data-parallel) axis; the user towers and PLM bulk
    compute shard here; gradients are combined by XLA's reduce-scatter /
    all-reduce over ICI.
  * ``model`` — tensor-parallel axis (optional, default 1): PLM weight
    matrices shard Megatron-style (see ``miner_tpu.parallel.tp``); XLA's
    SPMD partitioner inserts the activation collectives.
  * ``table`` — news-embedding-table axis; the inference cache rows shard
    here (see ``miner_tpu.parallel.news_cache``).

The reference has no parallelism at all (single GPU, reference:
src/base_trainer.py:24); this layer is new design per BASELINE.json.
Multi-host initialization goes through ``jax.distributed`` when coordinator
env vars are present.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
TABLE_AXIS = "table"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices on the data axis
    table: int = 1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        table = max(1, self.table)
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // (table * model)
        if data * model * table != n_devices:
            raise ValueError(
                f"mesh {data}x{model}x{table} does not cover "
                f"{n_devices} devices"
            )
        return data, model, table


def make_mesh(
    cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model, table = cfg.resolve(len(devices))
    arr = np.asarray(devices).reshape(data, model, table)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, TABLE_AXIS))


def maybe_initialize_distributed():
    """Initialize jax.distributed when a coordinator is configured via env."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
