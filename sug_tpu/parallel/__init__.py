from sug_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    distributed_init,
)
from sug_tpu.parallel.sequence_parallel import chamfer_sp, knn_sp

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "distributed_init",
    "chamfer_sp",
    "knn_sp",
]
