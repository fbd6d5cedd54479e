from .mesh import (
    DistributedRunner,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["DistributedRunner", "make_mesh", "replicate", "shard_batch"]
