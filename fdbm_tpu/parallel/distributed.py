"""Multi-host initialisation and host-level collectives.

The reference's multi-GPU story is single-node DDP (NCCL) plus
process-level file sharding (SURVEY.md section 2.7).  The TPU-native
equivalent for pods:

* call :func:`initialize` once per host before any device use —
  `jax.distributed.initialize()` wires the hosts into one runtime, after
  which `jax.devices()` spans the pod and the 1-D data mesh in
  parallel/mesh.py covers all chips (gradient all-reduce rides ICI within
  a slice and DCN across slices, inserted by XLA);
* `process_index()/process_count()` drive eval-file and inference-file
  sharding exactly like the reference's `dist.get_rank()/get_world_size()`
  (fdbm/model.py:297-312);
* :func:`all_gather_host_metrics` reduces per-host scalar metrics (the
  reference's `sync_dist=True` logging) through a tiny jitted psum.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise the multi-host runtime (no-op on a single host or when
    already initialised)."""
    if jax.process_count() > 1:
        return  # already initialised
    if coordinator_address is None and num_processes is None:
        # Single-host (or TPU-pod auto-detect environment): initialize()
        # with no args auto-configures on Cloud TPU; harmless elsewhere.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def all_gather_host_metrics(metrics: Dict[str, float],
                            counts: Optional[Dict[str, int]] = None
                            ) -> Dict[str, float]:
    """Average scalar metrics across hosts (weighted by counts if given).

    Single-host: returns the input unchanged.  Multi-host: each metric is
    summed over processes via a jitted psum over a process-spanning array
    and divided by the total count.
    """
    if jax.process_count() == 1:
        return dict(metrics)
    keys = sorted(metrics)
    vals = np.array([metrics[k] for k in keys], np.float64)
    cnts = np.array([(counts or {}).get(k, 1) for k in keys], np.float64)

    from jax.experimental import multihost_utils

    gathered_v = multihost_utils.process_allgather(vals * cnts)
    gathered_c = multihost_utils.process_allgather(cnts)
    total_v = np.sum(gathered_v, axis=0)
    total_c = np.maximum(np.sum(gathered_c, axis=0), 1.0)
    return {k: float(total_v[i] / total_c[i]) for i, k in enumerate(keys)}
