from .mesh import (make_mesh, shard_batch, shard_host_batch, replicate_state,
                   make_parallel_trainer, init_multihost)
