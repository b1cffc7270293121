from .mesh import (init_distributed, is_master, make_mesh, replicate,
                   shard_batch)

__all__ = ["init_distributed", "is_master", "make_mesh", "replicate",
           "shard_batch"]
