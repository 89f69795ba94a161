"""Sampler integration tests (SURVEY.md section 4, point 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdbm_tpu.sampling import Bridge, _rk45, complex_normal_like


def _toy_data(seed=0, shape=(2, 1, 16, 8)):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    y = x + 0.3 * (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )
    return jnp.asarray(x), jnp.asarray(y)


def _oracle_model(x_clean):
    """Data-prediction oracle: always returns the true clean spec."""

    def model_fn(x_t, y, t):
        return jnp.broadcast_to(x_clean, x_t.shape)

    return model_fn


def test_complex_normal_unit_variance():
    key = jax.random.PRNGKey(0)
    z = complex_normal_like(key, jnp.zeros((100000,), jnp.complex64))
    var = float(jnp.mean(jnp.abs(z) ** 2))
    assert abs(var - 1.0) < 0.02


def test_sb_prior_at_T_is_y():
    """SB prior at t=T=1 is exactly y (sigma masked to 0)."""
    x, y = _toy_data()
    bridge = Bridge.create("sb", noise_schedule="bb")
    x0 = bridge.prior_sampling(jax.random.PRNGKey(1), y)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(y), atol=1e-6)


def test_fm_prior_is_noisy_y():
    """FM prior at t~0 is y + sigma_max*z."""
    _, y = _toy_data()
    bridge = Bridge.create("fm")
    x0 = bridge.prior_sampling(jax.random.PRNGKey(1), y)
    resid = np.asarray(x0 - y)
    # residual should be ~CN(0, sigma_max^2=1)
    var = np.mean(np.abs(resid) ** 2)
    assert 0.5 < var < 2.0


@pytest.mark.parametrize("schedule", ["bb", "ve"])
def test_sde_ei_oracle_recovers_clean(schedule):
    x, y = _toy_data()
    bridge = Bridge.create("sb", noise_schedule=schedule, N=30, sampler_type="sde_ei")
    out = bridge.sample(_oracle_model(x), y, jax.random.PRNGKey(2))
    err = float(jnp.linalg.norm(out - x) / jnp.linalg.norm(x))
    assert err < 0.05, err


@pytest.mark.parametrize("schedule", ["bb", "gmax"])
def test_ode_ei_oracle_exact(schedule):
    """The exponential integrator is *exact* for a constant data estimate,
    so with an oracle model every N recovers the clean spec to fp32 noise."""
    x, y = _toy_data()
    for n in (1, 2, 8, 32):
        bridge = Bridge.create("sb", noise_schedule=schedule, N=n, sampler_type="ode_ei")
        out = bridge.sample(_oracle_model(x), y, jax.random.PRNGKey(3))
        err = float(jnp.linalg.norm(out - x) / jnp.linalg.norm(x))
        assert err < 1e-2, (n, err)


def test_fm_ode_ei_oracle():
    x, y = _toy_data()
    bridge = Bridge.create("fm", N=50, sampler_type="ode_ei")
    out = bridge.sample(_oracle_model(x), y, jax.random.PRNGKey(4))
    err = float(jnp.linalg.norm(out - x) / jnp.linalg.norm(x))
    assert err < 0.1, err


def test_sde_ei_one_step_is_model_output():
    """N=1 bb SDE-EI: x1 = w_xt*y + w_s*model(y,y,1); w_z forced 0;
    w_xt=eps/1 ~ 1e-4, w_s ~ 1 => output ~= model estimate."""
    x, y = _toy_data()
    bridge = Bridge.create("sb", noise_schedule="bb", N=1, sampler_type="sde_ei")
    out = bridge.sample(_oracle_model(x), y, jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-3)


def test_pc_sampler_runs_finite():
    x, y = _toy_data()
    bridge = Bridge.create("sb", noise_schedule="ve", N=10, sampler_type="pc")
    out = bridge.sample(
        _oracle_model(x), y, jax.random.PRNGKey(6),
        predictor_name="euler_maruyama", corrector_name="ald",
    )
    assert np.all(np.isfinite(np.asarray(out).view(np.float32)))


def test_samplers_jit_compile():
    x, y = _toy_data()
    bridge = Bridge.create("sb", noise_schedule="bb", N=4, sampler_type="sde_ei")

    @jax.jit
    def run(y, key):
        return bridge.sample(_oracle_model(x), y, key)

    out = run(y, jax.random.PRNGKey(7))
    assert out.shape == y.shape
    assert out.dtype == jnp.complex64


def test_rk45_scalar_ode():
    """dx/dt = -x from 1.0 at t in [0,1] -> e^-1."""
    f = lambda t, x: -x
    x0 = jnp.ones((1,), jnp.float32)
    out = _rk45(f, x0, 0.0, 1.0, 1e-6, 1e-8, 10000)
    np.testing.assert_allclose(float(out[0]), np.exp(-1.0), rtol=1e-4)


def test_rk45_reverse_direction():
    """Integrating dx/dt = x backwards from t=1 to 0: x(0) = x(1)*e^-1."""
    f = lambda t, x: x
    x0 = jnp.ones((1,), jnp.float32)
    out = _rk45(f, x0, 1.0, 0.0, 1e-6, 1e-8, 10000)
    np.testing.assert_allclose(float(out[0]), np.exp(-1.0), rtol=1e-4)


def test_ode_int_sampler_oracle():
    x, y = _toy_data()
    bridge = Bridge.create("sb", noise_schedule="bb", sampler_type="ode_int")
    out = bridge.sample(_oracle_model(x), y, jax.random.PRNGKey(8))
    err = float(jnp.linalg.norm(out - x) / jnp.linalg.norm(x))
    assert err < 0.05, err
