"""Device-mesh data parallelism.

TPU-native replacement for the reference's Lightning DDP-over-NCCL
(train.py:155-163): a 1-D ``jax.sharding.Mesh`` over the ``data`` axis with
params replicated and the batch sharded.  Gradients are reduced by the
all-reduce XLA inserts automatically when a jitted computation consumes a
batch-sharded operand into replicated outputs — no explicit collectives are
needed anywhere (the reference likewise only ever needs grad all-reduce;
SURVEY.md section 2.7).

On a multi-host pod this extends by calling ``jax.distributed.initialize()``
before device enumeration; the mesh spans all global devices and ICI carries
the reductions within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              batch_size: Optional[int] = None) -> Mesh:
    """1-D data mesh.  If ``batch_size`` is given and ``n_devices`` is not,
    uses the largest device count that divides the global batch (a batch
    must shard evenly across the data axis)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"Requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    elif batch_size is not None:
        n = len(devs)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devs = devs[:n]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (tuple of [B, ...] arrays) sharded on the data axis.

    Single-process: ``batch`` is the global batch; a plain device_put
    splits it over the local devices. Multi-host: each process passes its
    *process-local* shard (global batch = concatenation over processes in
    process order, matching the device order of the 1-D mesh) and the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — no host ever materialises
    the full global batch (the reference's DDP semantics, train.py:155-163,
    where each rank loads only its sampler shard).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), batch)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)),
        batch)


def make_parallel_train_step(fdbm, mesh: Mesh, donate: bool = True):
    """jit the FDBM train step over the mesh.

    Params/opt-state/EMA are replicated; batches are sharded on their
    leading axis. Returns ``step(state, batch, key) -> (state, metrics)``.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    # `data` is a pytree-prefix sharding: it applies to every leaf of the
    # batch tuple ((x, y) or (x, y, weights)).
    return jax.jit(
        fdbm.train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_valid_step(fdbm, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        fdbm.valid_step,
        in_shardings=(repl, data, repl),
        out_shardings=repl,
    )


def make_parallel_enhance(fdbm, mesh: Mesh, **enhance_kwargs):
    """Batch-sharded enhancement: one jitted program whose utterance batch
    is split across the data axis (each chip samples its shard; no
    collectives needed). Complements per-process file sharding for
    single-controller multi-chip serving."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    def enhance(params, y_audio, key):
        return fdbm.enhance_batch(params, y_audio, key, **enhance_kwargs)

    return jax.jit(
        enhance,
        in_shardings=(repl, data, repl),
        out_shardings=data,
    )
