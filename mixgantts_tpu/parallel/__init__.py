from .mesh import (
    batch_sharding, make_mesh, replicate_state, replicated, shard_batch,
    shard_train_step,
)
from .tp import partition_specs, shard_state
