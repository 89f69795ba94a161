"""Round-4 correctness fixes (round-3 VERDICT weak #5/#6, next #8/#9):

* `parallel.distributed.initialize` never swallows failures silently:
  the auto-config path logs the exception, partial explicit args raise.
* `train.evaluate_files` streams eval files in bounded chunks instead of
  loading every utterance into host memory up front (the reference
  streams file-by-file, fdbm/model.py:317-331).
"""

import logging
import os

import numpy as np
import pytest

import jax

from fdbm_tpu.data import DataConfig, SpecsDataset
from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.parallel import distributed
from fdbm_tpu.utils.audio import write_wav

SMALL = dict(backbone="tfgridnet_4l32c80", n_fft=128, hop_length=64,
             num_frames=16)


# ---------------------------------------------------------------------------
# distributed.initialize failure paths
# ---------------------------------------------------------------------------


def test_initialize_partial_explicit_args_raise():
    with pytest.raises(ValueError, match="ALL of coordinator_address"):
        distributed.initialize(coordinator_address="localhost:1234")
    with pytest.raises(ValueError, match="ALL of coordinator_address"):
        distributed.initialize(num_processes=2)
    with pytest.raises(ValueError, match="ALL of coordinator_address"):
        distributed.initialize(coordinator_address="localhost:1234",
                               num_processes=2)  # missing process_id


def test_initialize_auto_failure_is_logged(monkeypatch, caplog):
    def boom():
        raise RuntimeError("no coordinator here")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with caplog.at_level(logging.INFO,
                         logger="fdbm_tpu.parallel.distributed"):
        distributed.initialize()  # must not raise on the auto path...
    # ...but must say so out loud (INFO on a plain box)
    assert any("auto-config failed" in r.getMessage() for r in caplog.records)
    assert any("no coordinator here" in r.getMessage() for r in caplog.records)

    # with pod-environment hints present, it escalates to WARNING
    caplog.clear()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    with caplog.at_level(logging.INFO,
                         logger="fdbm_tpu.parallel.distributed"):
        distributed.initialize()
    recs = [r for r in caplog.records if "auto-config failed" in r.getMessage()]
    assert recs and recs[0].levelno == logging.WARNING
    assert "TPU_WORKER_HOSTNAMES" in recs[0].getMessage()


def test_initialize_explicit_failure_propagates(monkeypatch):
    def boom(**kwargs):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        distributed.initialize(coordinator_address="localhost:1",
                               num_processes=2, process_id=0)


# ---------------------------------------------------------------------------
# streaming full-utterance eval
# ---------------------------------------------------------------------------


def test_evaluate_files_streams_in_bounded_chunks(tmp_path, monkeypatch):
    """evaluate_files must call the enhancer on bounded chunks (not one
    giant list), and the metrics must cover every file exactly once."""
    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    n_files = 10
    for kind in ("clean", "noisy"):
        os.makedirs(root / "valid" / kind, exist_ok=True)
    for i in range(n_files):
        L = int(rng.integers(2000, 4000))
        x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(L) / 16000)).astype(np.float32)
        write_wav(str(root / "valid" / "clean" / f"f{i}.wav"), x, 16000)
        write_wav(str(root / "valid" / "noisy" / f"f{i}.wav"),
                  x + 0.05 * rng.standard_normal(L).astype(np.float32), 16000)

    cfg = FDBMConfig(mode="generative", N=2, **SMALL)
    fdbm = FDBM(cfg)
    data_cfg = DataConfig(base_dir=str(root), batch_size=2, num_workers=1,
                          n_fft=SMALL["n_fft"], hop_length=SMALL["hop_length"],
                          num_frames=SMALL["num_frames"])
    valid_set = SpecsDataset(data_cfg, "valid", shuffle_spec=False, seed=0)

    calls = []

    class FakeEnhancer:
        def __init__(self, *a, **kw):
            pass

        def enhance_many(self, audios, key, **kw):
            calls.append(len(audios))
            return [np.asarray(a, np.float32) for a in audios]  # identity

    import fdbm_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "BucketedEnhancer", FakeEnhancer)
    out, counts = train_mod.evaluate_files(
        fdbm, None, valid_set, num_eval_files=n_files,
        key=jax.random.PRNGKey(0), sampler_batch=1)

    # chunk = 4 * sampler_batch = 4 -> 10 files stream as 4+4+2
    assert calls == [4, 4, 2]
    assert counts["si_sdr"] == n_files
    assert np.isfinite(out["si_sdr"])


def test_sorted_packing_plan():
    """BucketedEnhancer.plan: descending groups of batch_size, bucket =
    snapped group max, remainder on the shortest files, order-stable
    grouping (round-4 sweep: per-bucket packing wasted 31% of dispatched
    rows; sorted packing 15% with the same compiled shapes)."""
    import jax.numpy as jnp
    from fdbm_tpu.infer import BucketedEnhancer
    from fdbm_tpu.model import FDBM, FDBMConfig

    cfg = FDBMConfig(mode="generative", backbone="tfgridnet_4l32c80",
                     bridge="sb", noise_schedule="bb", sampler_type="sde_ei",
                     N=2, n_fft=128, hop_length=64, num_frames=32)
    enh = BucketedEnhancer(FDBM(cfg), params=None, N=2, batch_size=3,
                           bucket_frames_multiple=8)
    lens = [1000, 4000, 2500, 2600, 900, 1500, 3000]
    plan = enh.plan(lens)
    # groups descending by length; remainder (shortest) last
    assert [grp for _, grp in plan] == [[1, 6, 3], [2, 5, 0], [4]]
    q = 8 * 64
    for blen, grp in plan:
        assert blen % q == 0 and blen >= max(lens[i] for i in grp)
    # chunk-local planning at a batch_size multiple reproduces the
    # global plan slice (prewarm <-> enhance_folder shape agreement)
    order = sorted(range(len(lens)), key=lambda i: -lens[i])
    chunk = [lens[i] for i in order[:6]]
    sub = enh.plan(chunk)
    assert [blen for blen, _ in sub] == [blen for blen, _ in plan[:2]]
