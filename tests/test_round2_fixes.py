"""Round-2 correctness fixes (VERDICT.md weak #4, #5, #7):

* EMA under gradient accumulation blends only on optimizer-apply steps
  (reference updates EMA in optimizer_step, fdbm/model.py:129-132).
* Validation loss ignores wrap-padded remainder duplicates (mask weights).
* pc_sampler raises on unknown predictor/corrector names (except the
  documented 'reverse_diffusion' no-op alias).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdbm_tpu import losses
from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.sampling import Bridge

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


# ---------------------------------------------------------------------------
# EMA under gradient accumulation
# ---------------------------------------------------------------------------


def test_ema_gated_on_accumulation_steps():
    """With accumulate_grad_batches=k, EMA updates once per k micro-steps
    and matches the k=1 decay schedule per optimizer step."""
    k = 4
    kw = dict(SMALL); kw["backbone"] += "_predictive"
    cfg = FDBMConfig(mode="predictive", loss_type="data_prediction",
                     accumulate_grad_batches=k, **kw)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    batch = _batch()
    step = jax.jit(fdbm.train_step)
    key = jax.random.PRNGKey(1)

    ema0 = jax.tree_util.tree_leaves(state.ema_params)[0].copy()
    for i in range(k):
        key, sub = jax.random.split(key)
        prev_params = jax.tree_util.tree_leaves(state.params)[0].copy()
        state, _ = step(state, batch, sub)
        if i < k - 1:
            # no optimizer application yet: params and EMA unchanged
            np.testing.assert_array_equal(
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
                np.asarray(prev_params))
            np.testing.assert_array_equal(
                np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]),
                np.asarray(ema0))
            assert int(state.ema_num_updates) == 0
    # after k micro-steps: exactly one optimizer + EMA application
    assert int(state.ema_num_updates) == 1
    decay = 2.0 / 11.0  # min(0.999, (1+1)/(10+1))
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    np.testing.assert_allclose(e1, decay * np.asarray(ema0) + (1 - decay) * p1,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Masked validation loss
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("loss_type", [
    "data_prediction", "data_prediction_hybrid",
    "data_prediction_mel", "data_prediction_melphase",
])
def test_compute_loss_mask_equals_unpadded(loss_type):
    """Loss of a wrap-padded batch with the mask == loss of the real items."""
    rng = np.random.default_rng(0)
    b_real, b_pad = 3, 5
    f, t = 9, 16
    cfg = losses.make_loss_config(
        n_fft=16, hop_length=8, num_frames=t, loss_type=loss_type,
        sample_rate=16000)

    def cplx(shape):
        return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
                ).astype(np.complex64) * 0.1

    x = cplx((b_real, 1, f, t))
    x_hat = cplx((b_real, 1, f, t))
    # wrap-pad with duplicates of items 0..1
    x_p = np.concatenate([x, x[: b_pad - b_real]], axis=0)
    x_hat_p = np.concatenate([x_hat, x_hat[: b_pad - b_real]], axis=0)
    w = np.array([1, 1, 1, 0, 0], np.float32)

    ref = float(losses.compute_loss(cfg, jnp.asarray(x_hat), jnp.asarray(x)))
    masked = float(losses.compute_loss(cfg, jnp.asarray(x_hat_p),
                                       jnp.asarray(x_p), jnp.asarray(w)))
    np.testing.assert_allclose(masked, ref, rtol=1e-5)

    # and without the mask the padded batch is biased (sanity that the
    # mask is doing something)
    unmasked = float(losses.compute_loss(cfg, jnp.asarray(x_hat_p),
                                         jnp.asarray(x_p)))
    assert abs(unmasked - ref) > 1e-9


def test_valid_step_mask_invariant_to_remainder():
    """valid_step with a 0/1 mask == valid loss of only the real items."""
    kw = dict(SMALL); kw["backbone"] += "_predictive"
    cfg = FDBMConfig(mode="predictive", loss_type="data_prediction", **kw)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    x, y = _batch(b=4)
    key = jax.random.PRNGKey(1)

    full = float(fdbm.valid_step(state, (x, y), key))
    # wrap-pad to 6 with duplicates + mask
    x_p = np.concatenate([x, x[:2]], axis=0)
    y_p = np.concatenate([y, y[:2]], axis=0)
    w = np.array([1, 1, 1, 1, 0, 0], np.float32)
    masked = float(fdbm.valid_step(state, (x_p, y_p, w), key))
    np.testing.assert_allclose(masked, full, rtol=1e-5)


def test_batchloader_yields_mask(tmp_path):
    """BatchLoader(yield_mask=True) marks wrap-padded items with 0."""
    from fdbm_tpu.data import BatchLoader, DataConfig, SpecsDataset
    from fdbm_tpu.utils.audio import write_wav

    rng = np.random.default_rng(0)
    for sub in ("valid",):
        for kind in ("clean", "noisy"):
            d = tmp_path / sub / kind
            d.mkdir(parents=True)
            for i in range(5):
                write_wav(str(d / f"f{i}.wav"),
                          rng.standard_normal(3000).astype(np.float32) * 0.1,
                          16000)
    cfg = DataConfig(base_dir=str(tmp_path), batch_size=3, num_frames=16,
                     hop_length=64, n_fft=128)
    ds = SpecsDataset(cfg, "valid", shuffle_spec=False)
    loader = BatchLoader(ds, 3, shuffle=False, drop_last=False, yield_mask=True)
    batches = list(loader)
    assert len(batches) == 2
    x0, y0, m0 = batches[0]
    x1, y1, m1 = batches[1]
    assert x0.shape[0] == 3 and x1.shape[0] == 3
    np.testing.assert_array_equal(m0, [1, 1, 1])
    np.testing.assert_array_equal(m1, [1, 1, 0])


# ---------------------------------------------------------------------------
# pc_sampler strict names
# ---------------------------------------------------------------------------


def test_pc_sampler_rejects_unknown_names():
    bridge = Bridge.create("sb", N=2, noise_schedule="ve")
    y = jnp.zeros((1, 1, 9, 8), jnp.complex64)
    model = lambda x, yy, t: x
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="Unknown predictor"):
        bridge.pc_sampler(model, y, key, predictor_name="typo")
    with pytest.raises(ValueError, match="Unknown corrector"):
        bridge.pc_sampler(model, y, key, corrector_name="typo")
    # documented alias still works as a no-op predictor
    out = bridge.pc_sampler(model, y, key, predictor_name="reverse_diffusion",
                            corrector_name="none")
    assert out.shape == y.shape
