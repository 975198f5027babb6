from .mesh import make_mesh, shard_batch, replicate_state, shard_train_step
