"""Model-layer and data-parallel training tests.

Point 5 of the SURVEY test strategy: multi-device grad equivalence on the
virtual 8-device CPU mesh vs single device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdbm_tpu.model import FDBM, FDBMConfig, make_lr_schedule
from fdbm_tpu.parallel import make_mesh, make_parallel_train_step, shard_batch

# Tiny, fast config: short crops, small model.
SMALL = dict(
    backbone="tfgridnet_4l32c80",
    n_fft=128, hop_length=64, num_frames=32,
)


def _batch(b=2, seed=0, num_frames=32, hop=64):
    rng = np.random.default_rng(seed)
    L = (num_frames - 1) * hop
    x = rng.standard_normal((b, L)).astype(np.float32) * 0.1
    y = (x + 0.02 * rng.standard_normal((b, L))).astype(np.float32)
    return x, y


def test_lr_schedules():
    warm = make_lr_schedule(
        {"scheduler": "warmup",
         "config": {"warmup_steps": 10, "decay_until_step": 100,
                    "max_lr": 1e-3, "min_lr": 1e-5}}, 1e-4)
    assert float(warm(0)) == 0.0
    np.testing.assert_allclose(float(warm(5)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(warm(10)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(warm(100)), 1e-5, rtol=1e-3)
    np.testing.assert_allclose(float(warm(200)), 1e-5, rtol=1e-5)
    # midpoint of cosine
    np.testing.assert_allclose(float(warm(55)), 1e-5 + 0.5 * (1e-3 - 1e-5), rtol=1e-4)

    exp = make_lr_schedule({"scheduler": "exp", "config": {"gamma": 0.9}}, 1e-4)
    np.testing.assert_allclose(float(exp(2)), 1e-4 * 0.81, rtol=1e-5)

    fixed = make_lr_schedule(None, 3e-4)
    np.testing.assert_allclose(float(fixed(7)), 3e-4, rtol=1e-6)


@pytest.mark.parametrize("mode", ["generative", "predictive"])
def test_train_step_decreases_loss(mode):
    kw = dict(SMALL)
    if mode == "predictive":
        kw["backbone"] += "_predictive"
    cfg = FDBMConfig(mode=mode, loss_type="data_prediction", **kw)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    batch = _batch()
    step = jax.jit(fdbm.train_step)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(5):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["train_loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5


def test_ema_tracks_params():
    kw = dict(SMALL); kw["backbone"] += "_predictive"
    cfg = FDBMConfig(mode="predictive", loss_type="data_prediction", **kw)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    batch = _batch()
    step = jax.jit(fdbm.train_step)
    state2, _ = step(state, batch, jax.random.PRNGKey(1))
    # after 1 update with num_updates correction, decay = min(0.999, 2/11)
    decay = 2.0 / 11.0
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    e1 = jax.tree_util.tree_leaves(state2.ema_params)[0]
    expected = decay * np.asarray(p0) + (1 - decay) * np.asarray(p1)
    np.testing.assert_allclose(np.asarray(e1), expected, atol=1e-6)


def test_finetuning_mode_runs():
    cfg = FDBMConfig(mode="finetuning", loss_type="data_prediction_hybrid",
                     N=3, **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    batch = _batch()
    state, metrics = jax.jit(fdbm.train_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))


def test_enhance_audio_roundtrip():
    cfg = FDBMConfig(mode="generative", N=2, **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    y = np.random.default_rng(0).standard_normal(5000).astype(np.float32) * 0.1
    out = fdbm.enhance_audio(state.ema_params, y, jax.random.PRNGKey(2))
    assert out.shape == y.shape
    assert np.all(np.isfinite(out))


def test_data_parallel_matches_single_device():
    """8-way sharded step == single-device step on the same global batch."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    kw = dict(SMALL); kw["backbone"] += "_predictive"
    cfg = FDBMConfig(mode="predictive", loss_type="data_prediction", **kw)
    fdbm = FDBM(cfg)
    state0 = fdbm.init_state(jax.random.PRNGKey(0))
    batch = _batch(b=8)
    key = jax.random.PRNGKey(3)

    # single-device
    state_s, metrics_s = jax.jit(fdbm.train_step)(state0, batch, key)

    # 8-device mesh
    mesh = make_mesh(8)
    pstep = make_parallel_train_step(fdbm, mesh, donate=False)
    state0b = fdbm.init_state(jax.random.PRNGKey(0))
    sharded = shard_batch(mesh, batch)
    state_p, metrics_p = pstep(state0b, sharded, key)

    np.testing.assert_allclose(
        float(metrics_s["train_loss"]), float(metrics_p["train_loss"]), rtol=1e-5
    )
    # Adam's step-1 normalisation (m/sqrt(v) ~ sign(g)) amplifies
    # reduction-order float noise to O(lr); allow a few lr of slack.
    ps = jax.tree_util.tree_leaves(state_s.params)
    pp = jax.tree_util.tree_leaves(state_p.params)
    for a, b in zip(ps, pp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_ncsnpp_predictive_mode():
    cfg = FDBMConfig(mode="predictive", backbone="ncsnpp_v2_5M_predictive",
                     loss_type="data_prediction",
                     n_fft=128, hop_length=64, num_frames=32)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    state, metrics = jax.jit(fdbm.train_step)(state, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))


def test_enhance_with_pc_and_ode_int():
    cfg = FDBMConfig(mode="generative", N=4, noise_schedule="ve", **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    y = np.random.default_rng(0).standard_normal(3000).astype(np.float32) * 0.1
    out_pc = fdbm.enhance_audio(state.ema_params, y, jax.random.PRNGKey(1),
                                sampler_type="pc", predictor_name="euler_maruyama",
                                corrector_name="langevin")
    assert out_pc.shape == y.shape and np.all(np.isfinite(out_pc))
    out_int = fdbm.enhance_audio(state.ema_params, y, jax.random.PRNGKey(2),
                                 sampler_type="ode_int", max_steps=60)
    assert out_int.shape == y.shape and np.all(np.isfinite(out_int))


def test_melphase_train_step():
    cfg = FDBMConfig(mode="generative", loss_type="data_prediction_melphase",
                     **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    state, metrics = jax.jit(fdbm.train_step)(
        state, _batch(num_frames=32, hop=64), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))


def test_parallel_enhance_matches_single_device():
    """Batch-sharded enhancement over the 8-way mesh == single device."""
    from fdbm_tpu.parallel import make_parallel_enhance

    cfg = FDBMConfig(mode="generative", N=2, **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((8, 31 * 64)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    single = jax.jit(fdbm.enhance_batch)(state.ema_params, y, key)

    mesh = make_mesh(8)
    penh = make_parallel_enhance(fdbm, mesh)
    y_sharded = shard_batch(mesh, y)
    multi = penh(state.ema_params, y_sharded, key)

    # spec_back squares magnitudes, amplifying per-shard accumulation-order
    # float noise on an untrained net; compare in relative L2.
    s = np.asarray(single)
    m = np.asarray(multi)
    rel = np.linalg.norm(s - m) / (np.linalg.norm(s) + 1e-9)
    assert rel < 1e-2, rel


def test_remat_gradients_match():
    """cfg.remat wraps blocks in jax.checkpoint — gradients must be
    bit-identical to the unremat'd backward (it only changes scheduling)."""
    batch = _batch(b=2)
    grads = {}
    for rem in (False, True):
        cfg = FDBMConfig(mode="generative", remat=rem,
                         loss_type="data_prediction_hybrid", **SMALL)
        fdbm = FDBM(cfg)
        params = fdbm.init_params(jax.random.PRNGKey(0))
        grads[rem] = jax.grad(
            lambda p: fdbm.loss_fn(p, batch, jax.random.PRNGKey(1)))(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), grads[False], grads[True])
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5
