from .mesh import make_mesh, shard_batch, replicate_state, make_parallel_trainer
