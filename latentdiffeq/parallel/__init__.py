from .mesh import (make_mesh, replicate, shard_batch, P, NamedSharding,
                   initialize_distributed)
from .data_parallel import make_dp_train_step, make_shardmap_train_step

__all__ = ["make_mesh", "replicate", "shard_batch", "P", "NamedSharding",
           "initialize_distributed",
           "make_dp_train_step", "make_shardmap_train_step"]
