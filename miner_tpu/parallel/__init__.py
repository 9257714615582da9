from miner_tpu.parallel.mesh import MeshConfig, make_mesh
from miner_tpu.parallel.sharding import batch_sharding, replicate, table_sharding

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicate",
    "table_sharding",
]
