"""Pallas LSTM kernel correctness vs the lax.scan BiLSTM (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from fdbm_tpu.models.layers import BiLSTM
from fdbm_tpu.ops.lstm import bilstm_pallas, lstm_forward_pallas


def _params(key, d, h):
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / np.sqrt(h)
    w_ih = jax.random.uniform(k1, (2, d, 4 * h), jnp.float32, -scale, scale)
    w_hh = jax.random.uniform(k2, (2, h, 4 * h), jnp.float32, -scale, scale)
    bias = jax.random.uniform(k3, (2, 4 * h), jnp.float32, -scale, scale)
    return w_ih, w_hh, bias


def _scan_reference(x, w_ih, w_hh, bias):
    """Independent scan implementation of the same BiLSTM contract."""
    def run_dir(xd, wi, wh, bz, reverse):
        xp = xd @ wi + bz
        if reverse:
            xp = xp[:, ::-1]
        def cell(carry, g):
            h, c = carry
            gates = g + h @ wh
            i, f, gg, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h
        b = xd.shape[0]
        hdim = wh.shape[0]
        init = (jnp.zeros((b, hdim)), jnp.zeros((b, hdim)))
        _, hs = jax.lax.scan(cell, init, jnp.swapaxes(xp, 0, 1))
        hs = jnp.swapaxes(hs, 0, 1)
        return hs[:, ::-1] if reverse else hs

    fwd = run_dir(x, w_ih[0], w_hh[0], bias[0], False)
    bwd = run_dir(x, w_ih[1], w_hh[1], bias[1], True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def test_pallas_bilstm_matches_scan():
    key = jax.random.PRNGKey(0)
    d, h, b, s = 24, 20, 5, 37  # deliberately unaligned sizes
    w_ih, w_hh, bias = _params(key, d, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))

    ref = _scan_reference(x, w_ih, w_hh, bias)
    got = bilstm_pallas(x, w_ih, w_hh, bias)

    assert got.shape == ref.shape == (b, s, 2 * h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_unidirectional_reverse():
    key = jax.random.PRNGKey(2)
    d, h, b, s = 12, 16, 3, 21
    w_ih = jax.random.uniform(key, (d, 4 * h), jnp.float32, -0.25, 0.25)
    w_hh = jax.random.uniform(key, (h, 4 * h), jnp.float32, -0.25, 0.25)
    bias = jnp.zeros((4 * h,))
    x = jax.random.normal(jax.random.PRNGKey(3), (s, b, d))

    fwd = lstm_forward_pallas(x, w_ih, w_hh, bias, reverse=False)
    bwd = lstm_forward_pallas(x, w_ih, w_hh, bias, reverse=True)
    # reverse(run(reverse(x))) == run_reverse(x)
    fwd_of_flipped = lstm_forward_pallas(jnp.flip(x, 0), w_ih, w_hh, bias,
                                         reverse=False)
    np.testing.assert_allclose(np.asarray(bwd), np.asarray(jnp.flip(fwd_of_flipped, 0)),
                               atol=1e-6)
    assert not np.allclose(np.asarray(fwd), np.asarray(bwd))


def test_bilstm_module_pallas_flag_equivalence():
    """BiLSTM(use_pallas=True) == BiLSTM(use_pallas=False) on same params."""
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 19, 12))
    m_scan = BiLSTM(hidden=10, use_pallas=False)
    params = m_scan.init(jax.random.PRNGKey(5), x)
    out_scan = m_scan.apply(params, x)
    m_pal = BiLSTM(hidden=10, use_pallas=True)
    out_pal = m_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_scan), atol=2e-5)


def test_pallas_train_grads_match_scan():
    """Custom-VJP Pallas LSTM gradients == autodiff of the scan BiLSTM."""
    from fdbm_tpu.ops.lstm import bilstm_pallas_train

    key = jax.random.PRNGKey(10)
    d, h, b, s = 12, 10, 3, 19
    w_ih, w_hh, bias = _params(key, d, h)
    x = jax.random.normal(jax.random.PRNGKey(11), (b, s, d))
    tgt = jax.random.normal(jax.random.PRNGKey(12), (b, s, 2 * h))

    def loss_scan(args):
        w_ih, w_hh, bias, x = args
        out = _scan_reference(x, w_ih, w_hh, bias)
        return jnp.mean((out - tgt) ** 2)

    def loss_pallas(args):
        w_ih, w_hh, bias, x = args
        out = bilstm_pallas_train(x, w_ih, w_hh, bias)
        return jnp.mean((out - tgt) ** 2)

    args = (w_ih, w_hh, bias, x)
    v1, g1 = jax.value_and_grad(loss_scan)(args)
    v2, g2 = jax.value_and_grad(loss_pallas)(args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-3)


def test_pallas_train_forward_matches_infer():
    from fdbm_tpu.ops.lstm import bilstm_pallas, bilstm_pallas_train

    key = jax.random.PRNGKey(13)
    d, h, b, s = 16, 12, 2, 23
    w_ih, w_hh, bias = _params(key, d, h)
    x = jax.random.normal(jax.random.PRNGKey(14), (b, s, d))
    o1 = bilstm_pallas(x, w_ih, w_hh, bias)
    o2 = bilstm_pallas_train(x, w_ih, w_hh, bias)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_fused_bilstm_aligned_sequence():
    """Fused kernel's no-padding branch (S multiple of 16) matches scan."""
    key = jax.random.PRNGKey(2)
    d, h, b, s = 16, 12, 4, 32
    w_ih, w_hh, bias = _params(key, d, h)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, s, d))
    ref = _scan_reference(x, w_ih, w_hh, bias)
    got = bilstm_pallas(x, w_ih, w_hh, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
