from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from .sweep import (
    init_seed_sweep,
    make_grid_mesh,
    make_seed_mesh,
    make_sweep_train_step,
)

__all__ = [
    "batch_sharding",
    "init_seed_sweep",
    "make_grid_mesh",
    "make_mesh",
    "make_seed_mesh",
    "make_sweep_train_step",
    "replicate",
    "shard_batch",
]
