"""upfirdn2d golden tests + NCSN++ backbone shape/grad tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdbm_tpu.models import BackboneRegistry
from fdbm_tpu.ops.upfirdn2d import (downsample_2d, setup_fir_kernel,
                                    upfirdn2d, upsample_2d)


def upfirdn2d_oracle(x_nchw, kernel, up, down, pad0, pad1):
    """Independent numpy transcription of the `upfirdn2d_native` semantics
    (reference op/upfirdn2d.py:162-203): zero-stuff, pad, correlate with
    flipped kernel, subsample."""
    n, c, h, w = x_nchw.shape
    kh, kw = kernel.shape
    # 1) zero-stuff by up
    up_h, up_w = h * up, w * up
    stuffed = np.zeros((n, c, up_h, up_w), x_nchw.dtype)
    stuffed[:, :, ::up, ::up] = x_nchw
    # 2) pad (negative = crop)
    padded = np.pad(stuffed, ((0, 0), (0, 0),
                              (max(pad0, 0), max(pad1, 0)),
                              (max(pad0, 0), max(pad1, 0))))
    if pad0 < 0 or pad1 < 0:
        padded = padded[:, :,
                        max(-pad0, 0): padded.shape[2] - max(-pad1, 0),
                        max(-pad0, 0): padded.shape[3] - max(-pad1, 0)]
    # 3) correlate with flipped kernel
    kf = kernel[::-1, ::-1]
    oh = padded.shape[2] - kh + 1
    ow = padded.shape[3] - kw + 1
    out = np.zeros((n, c, oh, ow), np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[:, :, i : i + oh, j : j + ow]
    # 4) subsample
    return out[:, :, ::down, ::down].astype(np.float32)


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (1, 1)), (2, 2, (3, 2))])
def test_upfirdn2d_matches_oracle(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)  # NCHW for oracle
    k = setup_fir_kernel([1, 3, 3, 1])
    ref = upfirdn2d_oracle(x, k, up, down, pad[0], pad[1])

    x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
    got = np.asarray(upfirdn2d(x_nhwc, jnp.asarray(k), up=up, down=down, pad=pad))
    got = np.moveaxis(got, -1, 1)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_upsample_downsample_shapes_and_mass():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    up = upsample_2d(x)
    assert up.shape == (1, 16, 16, 2)
    down = downsample_2d(x)
    assert down.shape == (1, 4, 4, 2)
    # constant input -> constant output (gain preservation)
    ones = jnp.ones((1, 16, 16, 1))
    u = np.asarray(upsample_2d(ones))
    np.testing.assert_allclose(u[0, 4:-4, 4:-4, 0], 1.0, atol=1e-5)
    d = np.asarray(downsample_2d(ones))
    np.testing.assert_allclose(d[0, 1:-1, 1:-1, 0], 1.0, atol=1e-5)


def test_upsample_then_downsample_approx_identity():
    # smooth (band-limited) input survives the low-pass FIR round trip
    g = np.arange(16)
    smooth = np.sin(2 * np.pi * g / 16)[:, None] * np.cos(2 * np.pi * g / 16)[None, :]
    x = jnp.asarray(smooth[None, :, :, None].astype(np.float32))
    y = downsample_2d(upsample_2d(x))
    assert y.shape == x.shape
    a, b = np.asarray(x).ravel(), np.asarray(y).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def _complex(rng, shape):
    return jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64))


def test_ncsnpp_5m_shapes():
    model = BackboneRegistry.get_by_name("ncsnpp_v2_5M")()
    rng = np.random.default_rng(0)
    x = _complex(rng, (1, 1, 257, 64))
    y = _complex(rng, (1, 1, 257, 64))
    t = jnp.asarray([0.5], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, y, t)
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert 3e6 < n < 8e6, n  # ~5M-class
    out = model.apply(params, x, y, t)
    assert out.shape == (1, 1, 257, 64)
    assert out.dtype == jnp.complex64
    assert np.all(np.isfinite(np.asarray(out).view(np.float32)))
    # zero row re-appended at bin 257
    np.testing.assert_array_equal(np.asarray(out[:, :, 256]), 0)


def test_ncsnpp_predictive():
    model = BackboneRegistry.get_by_name("ncsnpp_v2_5M_predictive")()
    rng = np.random.default_rng(1)
    y = _complex(rng, (1, 1, 64, 32))
    params = model.init(jax.random.PRNGKey(0), None, y)
    out = model.apply(params, None, y)
    assert out.shape == (1, 1, 64, 32)


def test_ncsnpp_grads_flow():
    model = BackboneRegistry.get_by_name("ncsnpp_v2_5M")()
    rng = np.random.default_rng(2)
    x = _complex(rng, (1, 1, 64, 16))
    y = _complex(rng, (1, 1, 64, 16))
    t = jnp.asarray([0.5], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, y, t)

    def loss(p):
        out = model.apply(p, x, y, t)
        return jnp.mean(jnp.abs(out - x) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.5


def test_groupnorm_act_matches_flax():
    """GroupNormAct (indicator-dot stats, fused SiLU+cast) == flax
    nn.GroupNorm + swish + astype on the same params (round-4: the flax
    lowering spent 28% of the NCSN++ serving program in padded stats
    views and separate act/cast passes)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fdbm_tpu.models.ncsnpp import GroupNormAct

    rng = np.random.default_rng(7)
    for c, g in ((16, 4), (32, 8), (128, 32)):
        x = jnp.asarray(rng.standard_normal((2, 5, 6, c)) * 2 + 0.3,
                        jnp.float32)
        ref_mod = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=jnp.float32)
        params = ref_mod.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(
            lambda p: p + 0.05 * jnp.arange(p.size, dtype=p.dtype
                                            ).reshape(p.shape), params)
        want = np.asarray(nn.swish(ref_mod.apply(params, x)))
        got_mod = GroupNormAct(num_groups=g, epsilon=1e-6, act=True,
                               out_dtype=jnp.float32)
        got = np.asarray(got_mod.apply(params, x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
