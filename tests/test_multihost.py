"""Real multi-host data path: 2-process CPU grad equivalence.

Spawns two OS processes wired together with jax.distributed (local
coordinator, gloo CPU collectives). Each process holds only its half of
the global batch; shard_batch assembles the global array via
jax.make_array_from_process_local_data. The resulting train step must
match a single-process run on the full batch (the reference's DDP
all-reduce semantics, train.py:155-163).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    sys.path.insert(0, %r)

    import numpy as np
    from fdbm_tpu.model import FDBM, FDBMConfig
    from fdbm_tpu.parallel import (make_mesh, make_parallel_train_step,
                                   shard_batch)

    cfg = FDBMConfig(mode="predictive", loss_type="data_prediction",
                     backbone="tfgridnet_4l32c80_predictive",
                     n_fft=128, hop_length=64, num_frames=32)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    L = 31 * 64
    x = rng.standard_normal((4, L)).astype(np.float32) * 0.1
    y = (x + 0.02 * rng.standard_normal((4, L))).astype(np.float32)
    # this process's half of the global batch (concat over process order)
    lo, hi = pid * 2, pid * 2 + 2
    local = (x[lo:hi], y[lo:hi])

    mesh = make_mesh()  # both global devices
    step = make_parallel_train_step(fdbm, mesh, donate=False)
    new_state, metrics = step(state, shard_batch(mesh, local),
                              jax.random.PRNGKey(1))
    # params are replicated: the local shard of any device holds the full
    # value (process_allgather rejects non-fully-addressable arrays)
    leaf = np.asarray(
        jax.tree_util.tree_leaves(new_state.params)[0].addressable_data(0))
    np.savez(f"{out}.p{pid}.npz", loss=float(metrics["train_loss"]),
             grad_norm=float(metrics["grad_norm"]), leaf=leaf)
""" % (REPO,))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    out = tmp_path / "result.npz"
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one local device per process
    procs = [
        subprocess.Popen([sys.executable, str(worker_py), str(port), str(i),
                          str(out)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outputs[i]}"
    results = [np.load(f"{out}.p{i}.npz") for i in range(2)]
    multi = results[0]
    # both processes must agree exactly (replicated state)
    np.testing.assert_array_equal(results[0]["leaf"], results[1]["leaf"])
    np.testing.assert_allclose(float(results[0]["loss"]),
                               float(results[1]["loss"]), rtol=1e-6)

    # single-process oracle on the full global batch
    from fdbm_tpu.model import FDBM, FDBMConfig

    cfg = FDBMConfig(mode="predictive", loss_type="data_prediction",
                     backbone="tfgridnet_4l32c80_predictive",
                     n_fft=128, hop_length=64, num_frames=32)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    L = 31 * 64
    x = rng.standard_normal((4, L)).astype(np.float32) * 0.1
    y = (x + 0.02 * rng.standard_normal((4, L))).astype(np.float32)
    new_state, metrics = jax.jit(fdbm.train_step)(state, (x, y),
                                                  jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(metrics["train_loss"]),
                               float(multi["loss"]), rtol=1e-5)
    # The 1- and 2-device runs are DIFFERENT XLA programs: within-dot
    # accumulation orders differ (~1e-6 local fp32 noise), and the
    # recurrent backprop at random init amplifies that to ~2e-4 on the
    # forward and ~1-2% on the gradient norm (measured round-3: fp32
    # 1.6%, float64 0.15% — pure conditioning, not a missing collective;
    # a dropped grad all-reduce would show ~sqrt(2)=41% here). Loss and
    # per-leaf checks above bound the semantics much tighter.
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(multi["grad_norm"]), rtol=5e-2)
    single_leaf = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    np.testing.assert_allclose(multi["leaf"], single_leaf, atol=1e-3)


METRICS_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    sys.path.insert(0, %r)

    import json
    import numpy as np
    from fdbm_tpu.parallel.distributed import (VALID_METRIC_SCHEMA,
                                               all_gather_host_metrics)

    # Process 0 computed si_sdr on 3 files and pesq on 2 (one PESQ failed);
    # process 1's [pi::pc] eval shard was EMPTY: no metrics at all.  Both
    # must still enter the collective in lockstep via the fixed schema.
    if pid == 0:
        metrics = {"valid_loss": 2.0, "si_sdr": 10.0, "pesq": 3.0}
        counts = {"valid_loss": 4, "si_sdr": 3, "pesq": 2}
    else:
        metrics, counts = {}, {}
    gathered = all_gather_host_metrics(metrics, counts,
                                       schema=VALID_METRIC_SCHEMA)
    with open(f"{out}.p{pid}.json", "w") as f:
        json.dump(gathered, f)
""" % (REPO,))


@pytest.mark.slow
def test_metric_gather_with_empty_host_shard(tmp_path):
    """One host with zero eval files must not desync/hang the metric gather
    (VERDICT r2 item 2; reference sync_dist semantics model.py:297-312)."""
    worker_py = tmp_path / "metrics_worker.py"
    worker_py.write_text(METRICS_WORKER)
    out = tmp_path / "metrics"
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, str(worker_py), str(port), str(i),
                          str(out)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outputs[i]}"

    import json

    results = [json.loads((tmp_path / f"metrics.p{i}.json").read_text())
               for i in range(2)]
    # both hosts see the identical global averages
    assert results[0] == results[1]
    got = results[0]
    # count-weighted means over the only contributing host
    assert got["valid_loss"] == pytest.approx(2.0)
    assert got["si_sdr"] == pytest.approx(10.0)
    assert got["pesq"] == pytest.approx(3.0)
    # estoi had zero total count everywhere -> dropped, not NaN/0
    assert "estoi" not in got
