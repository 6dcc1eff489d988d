from highresnet_tpu.parallel.distributed import (
    broadcast_string,
    global_from_replicated,
    is_multihost,
    make_global_batch,
    maybe_initialize,
    replicate_to_mesh,
)
from highresnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "maybe_initialize",
    "is_multihost",
    "make_global_batch",
    "global_from_replicated",
    "replicate_to_mesh",
    "broadcast_string",
]
