from fdbm_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    make_parallel_valid_step,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_parallel_train_step",
    "make_parallel_valid_step",
    "shard_batch",
]
