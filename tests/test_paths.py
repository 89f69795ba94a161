"""Path-math golden tests.

The oracle below is an independent float64 numpy transcription of the SB/FM
path formulas (reference: fdbm/bridge.py:187-385, documented in SURVEY.md
section 2.2).  Our jnp float32 implementation must agree to ~1e-5.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fdbm_tpu import paths


EPS = 1e-8


def oracle_rhos_alphas(t, schedule, k=2.6, c=0.4, b0=0.01, b1=20.0, rho=1.0, T=1.0):
    t = np.asarray(t, np.float64)
    bint = lambda s: b0 * s + 0.5 * (b1 - b0) * s ** 2
    ones = np.ones_like(t)
    if schedule == "gmax":
        alpha_t, alpha_T = ones, ones
        rho_t = np.sqrt(bint(t))
        rho_T = np.sqrt(bint(T)) * ones
    elif schedule == "vp":
        alpha_t = np.exp(-0.5 * bint(t))
        alpha_T = np.exp(-0.5 * bint(T)) * ones
        rho_t = np.sqrt(c * (np.exp(bint(t)) - 1))
        rho_T = np.sqrt(c * (np.exp(bint(T)) - 1)) * ones
    elif schedule == "ve":
        alpha_t, alpha_T = ones, ones
        rho_t = np.sqrt(c * (k ** (2 * t) - 1) / (2 * np.log(k)))
        rho_T = np.sqrt(c * (k ** (2 * T) - 1) / (2 * np.log(k))) * ones
    elif schedule == "bb":
        alpha_t, alpha_T = ones, ones
        rho_t = np.sqrt(t) * rho
        rho_T = ones * rho
    alpha_bar = alpha_t / (alpha_T + EPS)
    rho_bar = np.sqrt(rho_T ** 2 - rho_t ** 2 + EPS)
    return rho_t, rho_T, rho_bar, alpha_t, alpha_T, alpha_bar


def oracle_path_param(t, schedule):
    rho_t, rho_T, rho_bar, alpha_t, alpha_T, alpha_bar = oracle_rhos_alphas(t, schedule)
    a = alpha_t * rho_bar ** 2 / (rho_T ** 2 + EPS)
    b = alpha_bar * rho_t ** 2 / (rho_T ** 2 + EPS)
    s = alpha_t * rho_bar * rho_t / (rho_T + EPS)
    mask = np.asarray(t) == 1.0
    return np.where(mask, 0, a), np.where(mask, 1, b), np.where(mask, 0, s)


TS = np.array([0.0001, 0.03, 0.25, 0.5, 0.9, 0.999, 1.0], np.float64)


@pytest.mark.parametrize("schedule", ["bb", "ve", "vp", "gmax"])
def test_sb_path_param_matches_oracle(schedule):
    path = paths.SBPath(noise_schedule=schedule)
    a, b, s = path.path_param(jnp.asarray(TS, jnp.float32))
    a_o, b_o, s_o = oracle_path_param(TS, schedule)
    np.testing.assert_allclose(np.asarray(a), a_o, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(b), b_o, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s), s_o, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("schedule", ["bb", "ve", "vp", "gmax"])
def test_sb_endpoint_masking(schedule):
    """At t==T==1 the prior is exactly y: a=0, b=1, sigma=0 (bridge.py:276-279)."""
    path = paths.SBPath(noise_schedule=schedule)
    a, b, s = path.path_param(jnp.asarray([1.0], jnp.float32))
    assert float(a[0]) == 0.0
    assert float(b[0]) == 1.0
    assert float(s[0]) == 0.0
    assert float(path.sigma_t(jnp.asarray([1.0]))[0]) == 0.0


def test_sb_bb_closed_form():
    """bb: rho_t=sqrt(t), rho_T=1 => a=(1-t+eps)/(1+eps), b=t/(1+eps)."""
    t = 0.36
    path = paths.SBPath(noise_schedule="bb")
    a, b, s = path.path_param(jnp.asarray([t], jnp.float32))
    np.testing.assert_allclose(float(a[0]), (1 - t + EPS) / (1 + EPS), rtol=1e-6)
    np.testing.assert_allclose(float(b[0]), t / (1 + EPS), rtol=1e-6)
    np.testing.assert_allclose(
        float(s[0]), np.sqrt(1 - t + EPS) * np.sqrt(t) / (1 + EPS), rtol=1e-6
    )


@pytest.mark.parametrize("schedule", ["bb", "ve", "vp", "gmax"])
def test_sde_ei_weights_match_oracle(schedule):
    t_prev, t_curr = TS[4], TS[2]  # reverse direction: 0.9 -> 0.25
    path = paths.SBPath(noise_schedule=schedule)
    w_xt, w_s, w_z = path.sampling_param_sde_ei(
        jnp.asarray([t_curr], jnp.float32), jnp.asarray([t_prev], jnp.float32)
    )
    rho_p, _, _, al_p, _, _ = oracle_rhos_alphas(np.array([t_prev]), schedule)
    rho_c, _, _, al_c, _, _ = oracle_rhos_alphas(np.array([t_curr]), schedule)
    w_xt_o = al_c * rho_c ** 2 / (al_p * rho_p ** 2 + EPS)
    tmp = 1 - rho_c ** 2 / (rho_p ** 2 + EPS)
    w_s_o = al_c * tmp
    w_z_o = al_c * rho_c * np.sqrt(tmp)
    np.testing.assert_allclose(float(w_xt[0]), w_xt_o[0], rtol=2e-5)
    np.testing.assert_allclose(float(w_s[0]), w_s_o[0], rtol=2e-5)
    np.testing.assert_allclose(float(w_z[0]), w_z_o[0], rtol=2e-5)


@pytest.mark.parametrize("schedule", ["bb", "ve", "vp", "gmax"])
def test_ode_ei_weights_match_oracle(schedule):
    t_prev, t_curr = 0.7, 0.4
    path = paths.SBPath(noise_schedule=schedule)
    w_xt, w_s, w_y = path.sampling_param_ode_ei(
        jnp.asarray([t_curr], jnp.float32), jnp.asarray([t_prev], jnp.float32)
    )
    rho_p, rho_T, rhob_p, al_p, al_T, _ = oracle_rhos_alphas(np.array([t_prev]), schedule)
    rho_c, rho_T, rhob_c, al_c, al_T, _ = oracle_rhos_alphas(np.array([t_curr]), schedule)
    w_xt_o = al_c * rho_c * rhob_c / (al_p * rho_p * rhob_p + EPS)
    w_s_o = al_c / (rho_T ** 2 + EPS) * (rhob_c ** 2 - rhob_p * rho_c * rhob_c / (rho_p + EPS))
    w_y_o = al_c / (al_T * rho_T ** 2 + EPS) * (
        rho_c ** 2 - rho_p * rho_c * rhob_c / (rhob_p + EPS)
    )
    np.testing.assert_allclose(float(w_xt[0]), w_xt_o[0], rtol=3e-5)
    np.testing.assert_allclose(float(w_s[0]), w_s_o[0], rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(float(w_y[0]), w_y_o[0], rtol=3e-5, atol=1e-6)


def test_fm_path_param():
    path = paths.FMPath()
    t = jnp.asarray([0.0, 0.25, 1.0], jnp.float32)
    a, b, s = path.path_param(t)
    np.testing.assert_allclose(np.asarray(a), [0, 0.25, 1.0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(b), [1.0, 0.75, 0.0], atol=1e-7)
    # sigma_t = t*sigma_min + (1-t)*sigma_max with defaults 0.01/1.0
    np.testing.assert_allclose(np.asarray(s), [1.0, 0.7525, 0.01], atol=1e-7)


def test_fm_ode_ei_is_euler():
    """For OT-CFM, the EI step equals an Euler step of the ODE."""
    path = paths.FMPath()
    t_prev, t_curr = 0.2, 0.4
    w_xt, w_s, w_y = path.sampling_param_ode_ei(
        jnp.asarray([t_curr], jnp.float32), jnp.asarray([t_prev], jnp.float32)
    )
    # Euler: x' = x + dt * (w_x x + w_s s + w_y y) with ode weights at t_prev
    wx, ws, wy = path.ode_weights(jnp.asarray([t_prev], jnp.float32))
    dt = t_curr - t_prev
    np.testing.assert_allclose(float(w_xt[0]), 1 + dt * float(wx[0]), rtol=1e-4)
    np.testing.assert_allclose(float(w_s[0]), dt * float(ws[0]), rtol=1e-4)
    np.testing.assert_allclose(float(w_y[0]), dt * float(wy[0]), rtol=1e-4)


def test_sampling_direction():
    assert paths.SBPath().sampling_direction == "reverse"
    assert paths.FMPath().sampling_direction == "forward"


def test_make_path_ignores_unknown_kwargs():
    p = paths.make_path("sb", noise_schedule="ve", batch_size=4, backbone="x")
    assert isinstance(p, paths.SBPath)
    assert p.noise_schedule == "ve"
