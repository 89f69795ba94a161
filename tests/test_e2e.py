"""End-to-end smoke tests (SURVEY.md section 4, point 6): synthetic wav dir
-> Trainer 1 epoch -> checkpoint written -> folder inference -> finite wavs.
"""

import json
import os

import numpy as np
import pytest

import jax

from fdbm_tpu.data import DataConfig
from fdbm_tpu.infer import BucketedEnhancer, enhance_folder, enhance_single
from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.train import Trainer
from fdbm_tpu.utils.audio import read_wav, write_wav

SMALL = dict(backbone="tfgridnet_4l32c80", n_fft=128, hop_length=64, num_frames=16)


@pytest.fixture(scope="module")
def wav_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    for subset, n in [("train", 4), ("valid", 2), ("test", 3)]:
        for kind in ("clean", "noisy"):
            os.makedirs(root / subset / kind, exist_ok=True)
        for i in range(n):
            L = int(rng.integers(2000, 5000))
            x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(L) / 16000)).astype(np.float32)
            n_ = 0.05 * rng.standard_normal(L).astype(np.float32)
            write_wav(str(root / subset / "clean" / f"f{i}.wav"), x, 16000)
            write_wav(str(root / subset / "noisy" / f"f{i}.wav"), x + n_, 16000)
    return str(root)


def test_train_eval_infer_cycle(wav_root, tmp_path):
    cfg = FDBMConfig(mode="generative", N=2, loss_type="data_prediction",
                     scheduler_config={"scheduler": "fixed"}, **SMALL)
    fdbm = FDBM(cfg)
    data_cfg = DataConfig(base_dir=wav_root, batch_size=2, num_workers=1,
                          n_fft=SMALL["n_fft"], hop_length=SMALL["hop_length"],
                          num_frames=SMALL["num_frames"])
    log_dir = str(tmp_path / "run")
    trainer = Trainer(fdbm, data_cfg, log_dir, max_steps=3, max_epochs=2,
                      num_eval_files=2, save_ckpt_interval=0, snapshot=False)
    trainer.fit(resume=False)

    # checkpoint written
    assert os.path.isdir(os.path.join(log_dir, "checkpoints", "last"))
    # metrics logged
    lines = open(os.path.join(log_dir, "metrics.jsonl")).read().strip().splitlines()
    assert lines
    recs = [json.loads(l) for l in lines]
    assert any("valid_loss" in r for r in recs)
    assert any("si_sdr" in r for r in recs)
    # eval-time PESQ is live via the vendored estimator, and the best_pesq
    # checkpoint slot gets exercised (reference model.py:346-348,
    # train.py:147-150)
    assert any("pesq" in r for r in recs)
    assert os.path.isdir(os.path.join(log_dir, "checkpoints", "best_pesq"))
    # sample wavs dumped
    samples = os.listdir(os.path.join(log_dir, "valid_samples"))
    assert any(s.endswith("_enh.wav") for s in samples)

    # folder inference from the trained state
    from fdbm_tpu.checkpoint import CheckpointManager

    state = fdbm.init_state(jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    state = mgr.restore("last", abstract)
    assert int(state.step) >= 2

    enhanced_dir = str(tmp_path / "enhanced")
    stats = enhance_folder(
        fdbm, state.ema_params,
        test_dir=os.path.join(wav_root, "test", "noisy"),
        enhanced_dir=enhanced_dir, N=2, batch_size=2,
        bucket_frames_multiple=16, progress=False,
    )
    assert stats.files == 3 and stats.failures == 0
    for f in os.listdir(enhanced_dir):
        audio, sr = read_wav(os.path.join(enhanced_dir, f))
        assert np.all(np.isfinite(audio))
        assert np.max(np.abs(audio)) <= 1.0 + 1e-6


def test_enhance_single_writes_wav(wav_root, tmp_path):
    cfg = FDBMConfig(mode="generative", N=2, **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    noisy = os.path.join(wav_root, "test", "noisy", "f0.wav")
    out = str(tmp_path / "enh.wav")
    x_hat = enhance_single(fdbm, state.ema_params, noisy, out, N=2)
    assert os.path.exists(out)
    orig, _ = read_wav(noisy)
    assert len(x_hat) == orig.shape[-1]


def test_bucketed_enhancer_orders_and_lengths(wav_root):
    cfg = FDBMConfig(mode="generative", N=1, **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    audios = [rng.standard_normal(L).astype(np.float32) * 0.1
              for L in (1500, 4000, 2500, 4000)]
    enh = BucketedEnhancer(fdbm, state.ema_params, batch_size=2,
                           bucket_frames_multiple=8)
    outs = enh.enhance_many(audios, jax.random.PRNGKey(0))
    assert [len(o) for o in outs] == [len(a) for a in audios]
    assert all(np.all(np.isfinite(o)) for o in outs)


def test_long_utterance_chunked_enhancement():
    """Utterances beyond max_seconds go through chunked overlap-add."""
    cfg = FDBMConfig(mode="generative", N=1, **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    long_audio = rng.standard_normal(40000).astype(np.float32) * 0.1
    short_audio = rng.standard_normal(3000).astype(np.float32) * 0.1
    enh = BucketedEnhancer(fdbm, state.ema_params, batch_size=2,
                           bucket_frames_multiple=8)
    # force chunking at ~1 second
    outs = enh.enhance_many([long_audio, short_audio], jax.random.PRNGKey(1),
                            max_seconds=1.0)
    assert len(outs[0]) == len(long_audio)
    assert len(outs[1]) == len(short_audio)
    assert all(np.all(np.isfinite(o)) for o in outs)


def test_chunk_plan_properties():
    """_chunk_plan: exact-length chunks, full coverage, >=16-frame overlap,
    bucket-grid snapped (zero padding when served), computed-frames
    minimal over the feasible k range."""
    cfg = FDBMConfig(mode="generative", N=1, **SMALL)
    fdbm = FDBM(cfg)
    enh = BucketedEnhancer(fdbm, None, batch_size=2, chunk_seconds=0.5)
    hop = cfg.hop_length
    target = int(0.5 * cfg.sr)
    fine = 16 * hop
    overlap = 16 * hop
    hi = (3 * target + 1) // 2
    for L in (3000, 7900, 8000, 8500, 12000, 17000, 24001, 40000):
        chunk_len, starts = enh._chunk_plan(L)
        k = len(starts)
        assert starts[0] == 0
        assert starts[-1] + chunk_len >= L          # coverage
        assert chunk_len <= L
        if k == 1:
            assert chunk_len == L                   # short file untouched
            assert L <= max(hi, fine)
            continue
        assert chunk_len % fine == 0                # bounded compile set
        # chunked rows run at their exact compute shape: bucket == chunk
        assert enh._bucket_length(chunk_len) == chunk_len
        assert k >= -(-L // hi)                     # chunks near the band
        # k minimises computed samples vs the naive round(L/target) count
        k_naive = max(2, round(L / target))
        naive_len = -(-(-(-(L + (k_naive - 1) * overlap) // k_naive))
                      // fine) * fine
        assert k * chunk_len <= k_naive * max(naive_len, chunk_len)
        for a, b in zip(starts, starts[1:]):
            assert b > a
            assert a + chunk_len - b >= 16 * hop    # min cross-fade overlap


def test_pooled_chunk_serving_matches_whole(wav_root=None):
    """chunk_seconds pooled serving: short files are byte-identical to the
    unchunked path (same schedule, same programs); long files reassemble
    to the right length, finite, and close to the whole-file output away
    from chunk seams (N=1 deterministic ODE sampler)."""
    cfg = FDBMConfig(mode="generative", N=1, sampler_type="ode_ei",
                     noise_schedule="bb", bridge="sb", **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    long_audio = rng.standard_normal(20000).astype(np.float32) * 0.1
    short_audio = rng.standard_normal(3000).astype(np.float32) * 0.1

    plain = BucketedEnhancer(fdbm, state.ema_params, batch_size=2,
                             bucket_frames_multiple=8)
    pooled = BucketedEnhancer(fdbm, state.ema_params, batch_size=2,
                              bucket_frames_multiple=8, chunk_seconds=0.5)
    outs_whole = plain.enhance_many([long_audio, short_audio],
                                    jax.random.PRNGKey(5))
    outs_pool = pooled.enhance_many([long_audio, short_audio],
                                    jax.random.PRNGKey(5))
    assert [len(o) for o in outs_pool] == [20000, 3000]
    assert all(np.isfinite(o).all() for o in outs_pool)
    # A short file served ALONE takes the identical code path under both
    # enhancers (single chunk == whole file, same schedule, same bucket):
    # byte-identical.  (Within a mixed batch the bucket a short file pads
    # to depends on its batch partners in BOTH paths — the documented
    # bucketing deviation, infer.py module docstring.)
    solo_whole = plain.enhance_many([short_audio], jax.random.PRNGKey(7))
    solo_pool = pooled.enhance_many([short_audio], jax.random.PRNGKey(7))
    np.testing.assert_array_equal(solo_pool[0], solo_whole[0])
    # long file: an UNTRAINED net's output is an arbitrary function of
    # its (chunk-shaped) input, so sample-level closeness to the whole-
    # file output is not meaningful here — assert scale sanity; the
    # chunk->whole fidelity of the reassembly itself is proven exactly
    # by test_overlap_add_reconstruction, and end-to-end quality by the
    # ported-weight production-shape parity suite.
    rms_w = float(np.sqrt(np.mean(outs_whole[0] ** 2)))
    rms_p = float(np.sqrt(np.mean(outs_pool[0] ** 2)))
    assert 0.25 < rms_p / rms_w < 4.0, (rms_p, rms_w)


def test_overlap_add_reconstruction():
    """_overlap_add is exact for consistent segments: slicing one signal
    into the _chunk_plan windows and reassembling returns the signal."""
    cfg = FDBMConfig(mode="generative", N=1, **SMALL)
    fdbm = FDBM(cfg)
    enh = BucketedEnhancer(fdbm, None, batch_size=2, chunk_seconds=0.5)
    rng = np.random.default_rng(11)
    for L in (20000, 24001, 40000):
        sig = rng.standard_normal(L).astype(np.float32)
        chunk_len, starts = enh._chunk_plan(L)
        segs = [(s, sig[s : s + chunk_len]) for s in starts]
        rec = BucketedEnhancer._overlap_add(L, segs, 16 * cfg.hop_length)
        np.testing.assert_allclose(rec, sig, rtol=1e-6, atol=1e-6)


def test_fm_path_train_and_enhance(wav_root, tmp_path):
    """FM (OT flow-matching) generative config through the production
    Trainer + enhance loop (VERDICT r2 #10): finite decreasing loss, finite
    enhanced audio. The fm path samples forward in time with a noisy prior
    y + sigma_max*z (reference bridge.py:340-385)."""
    cfg = FDBMConfig(mode="generative", bridge="fm", noise_schedule="ot",
                     sampler_type="ode_ei", N=2,
                     loss_type="data_prediction", lr=1e-3, **SMALL)
    fdbm = FDBM(cfg)
    data_cfg = DataConfig(base_dir=wav_root, batch_size=2, num_workers=1,
                          n_fft=SMALL["n_fft"], hop_length=SMALL["hop_length"],
                          num_frames=SMALL["num_frames"])
    log_dir = str(tmp_path / "fm_run")
    trainer = Trainer(fdbm, data_cfg, log_dir, max_steps=8, max_epochs=8,
                      num_eval_files=1, save_ckpt_interval=0, snapshot=False,
                      log_every_n_steps=1)
    trainer.fit(resume=False)

    recs = [json.loads(l) for l in
            open(os.path.join(log_dir, "metrics.jsonl")).read().splitlines()]
    losses = [r["train_loss"] for r in recs if "train_loss" in r]
    assert losses and all(np.isfinite(losses))
    # training actually reduces the loss — compare half-means, not the
    # two endpoints: per-step losses are noisy (random t, random prior
    # draws) and the endpoint comparison flipped sign between numerically
    # equivalent LayerNorm lowerings (round-4: first step happened to
    # sample low, trajectory mean 5.32 -> 3.87)
    half = len(losses) // 2
    assert np.mean(losses[half:]) < np.mean(losses[:half])

    # enhance through the fm/ode_ei sampler from the trained state
    from fdbm_tpu.checkpoint import CheckpointManager

    state = fdbm.init_state(jax.random.PRNGKey(0))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    state = CheckpointManager(
        os.path.join(log_dir, "checkpoints")).restore("last", abstract)
    noisy, _ = read_wav(os.path.join(wav_root, "test", "noisy", "f0.wav"))
    out = fdbm.enhance_audio(state.ema_params, noisy[0], jax.random.PRNGKey(1))
    assert out.shape == noisy[0].shape
    assert np.all(np.isfinite(out))


def test_train_kill_resume_continues_step_counter(wav_root, tmp_path):
    """Own-run resume ergonomics (VERDICT r2 #9): train, stop, resume the
    same run dir -> the step counter continues from 'last' (the reference's
    --ckpt -> trainer.fit(ckpt_path) flow, train.py:64,166)."""
    cfg = FDBMConfig(mode="generative", N=1, loss_type="data_prediction",
                     **SMALL)
    data_cfg = DataConfig(base_dir=wav_root, batch_size=2, num_workers=1,
                          n_fft=SMALL["n_fft"], hop_length=SMALL["hop_length"],
                          num_frames=SMALL["num_frames"])
    log_dir = str(tmp_path / "resume_run")

    # first run: 2 steps, then "killed"
    trainer = Trainer(FDBM(cfg), data_cfg, log_dir, max_steps=2, max_epochs=9,
                      num_eval_files=0, save_ckpt_interval=0, snapshot=False)
    trainer.fit(resume=False)

    from fdbm_tpu.checkpoint import CheckpointManager

    fdbm2 = FDBM(cfg)
    state = fdbm2.init_state(jax.random.PRNGKey(0))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    mgr = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    assert int(mgr.restore("last", abstract).step) == 2

    # second run on the SAME dir with resume=True (the CLI --resume path)
    trainer2 = Trainer(fdbm2, data_cfg, log_dir, max_steps=4, max_epochs=9,
                       num_eval_files=0, save_ckpt_interval=0, snapshot=False)
    trainer2.fit(resume=True)
    assert int(mgr.restore("last", abstract).step) == 4
