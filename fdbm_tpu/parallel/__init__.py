from fdbm_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_enhance,
    make_parallel_train_step,
    make_parallel_valid_step,
    shard_batch,
)
from fdbm_tpu.parallel.distributed import all_gather_host_metrics, initialize

__all__ = [
    "make_mesh",
    "make_parallel_enhance",
    "make_parallel_train_step",
    "make_parallel_valid_step",
    "shard_batch",
    "all_gather_host_metrics",
    "initialize",
]
