from .mesh import (DATA_AXIS, init_distributed, is_master, make_mesh,
                   replicate, shard_batch)

__all__ = ["DATA_AXIS", "init_distributed", "is_master", "make_mesh",
           "replicate", "shard_batch"]
