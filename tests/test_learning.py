"""Learning sanity: a tiny predictive model trained briefly on synthetic
denoising must reduce its loss substantially (regression guard on the full
train stack: data -> STFT -> model -> loss -> optimiser -> EMA)."""

import numpy as np

import jax

from fdbm_tpu.model import FDBM, FDBMConfig


def test_predictive_model_learns():
    cfg = FDBMConfig(
        mode="predictive",
        backbone="tfgridnet_4l32c80_predictive",
        loss_type="data_prediction",
        n_fft=128, hop_length=64, num_frames=16,
        lr=1e-3,
        scheduler_config={"scheduler": "fixed"},
    )
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    step = jax.jit(fdbm.train_step)

    rng = np.random.default_rng(0)
    L = cfg.num_frames * cfg.hop_length - cfg.hop_length
    t_axis = np.arange(L) / 16000.0

    def make_batch(seed):
        r = np.random.default_rng(seed)
        freqs = r.uniform(200, 800, size=(2, 1))
        clean = 0.4 * np.sin(2 * np.pi * freqs * t_axis[None, :])
        noise = 0.15 * r.standard_normal((2, L))
        return clean.astype(np.float32), (clean + noise).astype(np.float32)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(24):
        key, sub = jax.random.split(key)
        state, metrics = step(state, make_batch(i % 8), sub)
        losses.append(float(metrics["train_loss"]))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(last)
    assert last < 0.7 * first, (first, last)
