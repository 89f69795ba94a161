"""TF-GridNet backbone shape/dtype/grad tests (SURVEY.md section 4, point 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdbm_tpu.models import BackboneRegistry


def _complex(rng, shape):
    return jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    )


@pytest.fixture(scope="module")
def small_model():
    model = BackboneRegistry.get_by_name("tfgridnet_4l32c80")()
    rng = np.random.default_rng(0)
    x = _complex(rng, (1, 1, 33, 16))
    y = _complex(rng, (1, 1, 33, 16))
    t = jnp.asarray([0.5], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, y, t)
    return model, params


def test_generative_shapes(small_model):
    model, params = small_model
    rng = np.random.default_rng(1)
    for f, t_frames in [(33, 16), (65, 24)]:
        x = _complex(rng, (2, 1, f, t_frames))
        y = _complex(rng, (2, 1, f, t_frames))
        t = jnp.asarray([0.5, 0.9], jnp.float32)
        out = model.apply(params, x, y, t)
        assert out.shape == (2, 1, f, t_frames)
        assert out.dtype == jnp.complex64
        assert np.all(np.isfinite(np.asarray(out).view(np.float32)))


def test_time_conditioning_changes_output(small_model):
    model, params = small_model
    rng = np.random.default_rng(2)
    x = _complex(rng, (1, 1, 33, 16))
    y = _complex(rng, (1, 1, 33, 16))
    o1 = model.apply(params, x, y, jnp.asarray([0.1], jnp.float32))
    o2 = model.apply(params, x, y, jnp.asarray([0.9], jnp.float32))
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-6


def test_predictive_variant():
    model = BackboneRegistry.get_by_name("tfgridnet_4l32c80_predictive")()
    rng = np.random.default_rng(3)
    y = _complex(rng, (1, 1, 33, 16))
    params = model.init(jax.random.PRNGKey(0), None, y)
    out = model.apply(params, None, y)
    assert out.shape == (1, 1, 33, 16)
    assert out.dtype == jnp.complex64


def test_param_count_default_variant():
    """The default 5l32c100 variant should be ~ the reference's ~2M params."""
    model = BackboneRegistry.get_by_name("tfgridnet_5l32c100")()
    rng = np.random.default_rng(4)
    x = _complex(rng, (1, 1, 33, 8))
    params = model.init(jax.random.PRNGKey(0), x, x, jnp.asarray([0.5]))
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert 1.5e6 < n < 3.5e6, n


def test_gradients_flow(small_model):
    model, params = small_model
    rng = np.random.default_rng(5)
    x = _complex(rng, (1, 1, 33, 16))
    y = _complex(rng, (1, 1, 33, 16))
    t = jnp.asarray([0.5], jnp.float32)

    def loss(p):
        out = model.apply(p, x, y, t)
        return jnp.mean(jnp.abs(out - x) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # Fourier projection W must be frozen (stop_gradient)
    w_grad = grads["params"]["time_emb"]["W"]
    np.testing.assert_array_equal(np.asarray(w_grad), 0)
    # ...but most other params must have nonzero grads
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.8


def test_jit_and_batch_consistency(small_model):
    model, params = small_model
    rng = np.random.default_rng(6)
    x = _complex(rng, (2, 1, 33, 16))
    y = _complex(rng, (2, 1, 33, 16))
    t = jnp.asarray([0.4, 0.4], jnp.float32)

    out_batch = jax.jit(model.apply)(params, x, y, t)
    out_single = model.apply(params, x[:1], y[:1], t[:1])
    # batch-size-dependent matmul tiling gives ~1e-4 accumulation noise
    np.testing.assert_allclose(
        np.asarray(out_batch[0]), np.asarray(out_single[0]), atol=2e-3
    )
