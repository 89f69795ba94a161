"""Fused grid-RNN kernel (ops/gridrnn.py) vs the unfused pipeline.

The fused kernel computes unfold(k=4) -> BiLSTM -> deconv -> overlap-add in
one Pallas program. Its contract: rows [3, L-1] (L = S-3) match the unfused
pipeline exactly; rows outside carry sequence-pad contamination and are
cropped by GridNetBlock. Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdbm_tpu.models.tfgridnet import GridNetBlock, _RnnPath
from fdbm_tpu.ops.gridrnn import grid_bilstm_fold

KS = 4


def _oracle(x, w_ih, w_hh, bias, wd):
    """Pure-numpy unfold -> BiLSTM -> deconv -> fold (torch semantics)."""
    s_len, b, c = x.shape
    L = s_len - (KS - 1)
    win = np.concatenate([x[t : t + L] for t in range(KS)], axis=-1)  # [L,B,4C]

    def lstm(seq, w_i, w_h, bi, reverse):
        h = np.zeros((b, w_h.shape[0]), np.float64)
        cst = np.zeros_like(h)
        order = range(L - 1, -1, -1) if reverse else range(L)
        out = np.zeros((L, b, w_h.shape[0]), np.float64)
        for s in order:
            g = seq[s] @ w_i + h @ w_h + bi
            hid = w_h.shape[0]
            i = 1 / (1 + np.exp(-g[:, :hid]))
            f = 1 / (1 + np.exp(-g[:, hid : 2 * hid]))
            gg = np.tanh(g[:, 2 * hid : 3 * hid])
            o = 1 / (1 + np.exp(-g[:, 3 * hid :]))
            cst = f * cst + i * gg
            h = o * np.tanh(cst)
            out[s] = h
        return out

    fwd = lstm(win.astype(np.float64), w_ih[0], w_hh[0], bias[0], False)
    bwd = lstm(win.astype(np.float64), w_ih[1], w_hh[1], bias[1], True)
    z = np.concatenate([fwd, bwd], axis=-1) @ wd  # [L, B, 4C]
    folded = np.zeros((s_len, b, c), np.float64)
    for tap in range(KS):
        folded[tap : tap + L] += z[:, :, tap * c : (tap + 1) * c]
    return folded


@pytest.mark.parametrize("s_len,b,c,hidden", [(35, 12, 16, 24), (20, 3, 8, 10)])
def test_fused_matches_oracle_on_crop(s_len, b, c, hidden):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((s_len, b, c)).astype(np.float32) * 0.5
    w_ih = rng.standard_normal((2, KS * c, 4 * hidden)).astype(np.float32) * 0.2
    w_hh = rng.standard_normal((2, hidden, 4 * hidden)).astype(np.float32) * 0.2
    bias = rng.standard_normal((2, 4 * hidden)).astype(np.float32) * 0.2
    wd = rng.standard_normal((2 * hidden, KS * c)).astype(np.float32) * 0.2

    got = np.asarray(grid_bilstm_fold(
        jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh),
        jnp.asarray(bias), jnp.asarray(wd)))
    want = _oracle(x, w_ih, w_hh, bias, wd)

    L = s_len - (KS - 1)
    np.testing.assert_allclose(got[3:L], want[3:L], rtol=2e-4, atol=2e-4)
    # rows outside [3, L-1] are contaminated by design — assert they are at
    # least finite so downstream LN/attention on padded rows stays sane
    assert np.isfinite(got).all()


@pytest.mark.parametrize("b,s_len,p,c,hidden", [
    (2, 35, 12, 16, 24),   # partial seq chunk (35 = 2*16+3)
    (1, 32, 9, 8, 10),     # seq exactly 2 chunks, tiny batch axis
    (3, 20, 97, 16, 20),   # batch axis above one tile
])
def test_canvas_kernel_matches_oracle_on_crop(b, s_len, p, c, hidden):
    """grid_rnn_seq1 on [B, S, P, C] == the [S, B', C] oracle per b-slice."""
    from fdbm_tpu.ops.gridrnn import grid_rnn_seq1

    rng = np.random.default_rng(3)
    x = rng.standard_normal((b, s_len, p, c)).astype(np.float32) * 0.5
    w_ih = rng.standard_normal((2, KS * c, 4 * hidden)).astype(np.float32) * 0.2
    w_hh = rng.standard_normal((2, hidden, 4 * hidden)).astype(np.float32) * 0.2
    bias = rng.standard_normal((2, 4 * hidden)).astype(np.float32) * 0.2
    wd = rng.standard_normal((2 * hidden, KS * c)).astype(np.float32) * 0.2

    got = np.asarray(grid_rnn_seq1(
        jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh),
        jnp.asarray(bias), jnp.asarray(wd)))
    # oracle works on [S, B', C]: move batch+p into the batch axis
    xr = np.moveaxis(x, 1, 0).reshape(s_len, b * p, c)
    want = _oracle(xr, w_ih, w_hh, bias, wd).reshape(s_len, b, p, c)
    want = np.moveaxis(want, 0, 1)

    L = s_len - (KS - 1)
    np.testing.assert_allclose(got[:, 3:L], want[:, 3:L], rtol=2e-4, atol=2e-4)


def test_rnnpath_fused_matches_scan_on_crop():
    """_RnnPath with use_pallas=True (fused kernel) == scan path on the
    GridNetBlock crop region, same params."""
    b, t, q, c, hidden = 2, 12, 11, 16, 20
    olp = 3
    rng = np.random.default_rng(1)
    xp = jnp.asarray(rng.standard_normal((b, t + 2 * olp, q + 2 * olp, c)),
                     jnp.float32)

    path_scan = _RnnPath(c, hidden, jnp.float32, use_pallas=False)
    path_fused = _RnnPath(c, hidden, jnp.float32, use_pallas=True)
    params = path_scan.init(jax.random.PRNGKey(0), xp, 2)
    # identical param trees: the fused path must accept scan-path params
    out_scan = path_scan.apply(params, xp, 2)
    out_fused = path_fused.apply(params, xp, 2)
    # crop region along the seq axis (axis 2 for seq_axis=2)
    seq = q + 2 * olp
    L = seq - (4 - 1)
    np.testing.assert_allclose(
        np.asarray(out_fused)[:, :, olp : L],
        np.asarray(out_scan)[:, :, olp : L], rtol=2e-4, atol=2e-4)

    # and along the time axis (seq_axis=1)
    out_scan_t = path_scan.apply(params, xp, 1)
    out_fused_t = path_fused.apply(params, xp, 1)
    seq_t = t + 2 * olp
    Lt = seq_t - 3
    np.testing.assert_allclose(
        np.asarray(out_fused_t)[:, olp : Lt],
        np.asarray(out_scan_t)[:, olp : Lt], rtol=2e-4, atol=2e-4)


def test_gridnetblock_fused_matches_scan_exactly():
    """Full GridNetBlock output (post-crop) is identical between paths."""
    b, t, q, c, hidden = 2, 10, 9, 16, 20
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, t, q, c)), jnp.float32)

    blk_scan = GridNetBlock(emb_dim=c, hidden=hidden, use_pallas=False)
    blk_fused = GridNetBlock(emb_dim=c, hidden=hidden, use_pallas=True)
    params = blk_scan.init(jax.random.PRNGKey(0), x)
    out_scan = blk_scan.apply(params, x)
    out_fused = blk_fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_scan),
                               rtol=5e-4, atol=5e-4)


def test_full_model_fused_matches_scan():
    """Whole TFGridNet forward (2 blocks, time-conditioned): the Pallas
    inference path — canvas swaps between blocks, grid-RNN kernels,
    fused attention, lane-stats norms — equals the XLA path on shared
    params."""
    from fdbm_tpu.models.tfgridnet import TFGridNet

    b, f, t = 2, 11, 10
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((b, 1, f, t))
                    + 1j * rng.standard_normal((b, 1, f, t)), jnp.complex64)
    y = jnp.asarray(rng.standard_normal((b, 1, f, t))
                    + 1j * rng.standard_normal((b, 1, f, t)), jnp.complex64)
    tt = jnp.asarray(rng.uniform(0.1, 1.0, (b,)), jnp.float32)

    kw = dict(n_layers=2, emb_dim=16, hidden=20)
    m_scan = TFGridNet(use_pallas=False, **kw)
    m_fused = TFGridNet(use_pallas=True, **kw)
    params = m_scan.init(jax.random.PRNGKey(0), x, y, tt)
    out_scan = np.asarray(m_scan.apply(params, x, y, tt))
    out_fused = np.asarray(m_fused.apply(params, x, y, tt))
    np.testing.assert_allclose(out_fused, out_scan, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("mxu_bf16", [False, True])
def test_canvas_kernel_bf16_streams(mxu_bf16):
    """bf16 io streams (the production serving configuration,
    inference_dtype=bfloat16 in bench.py) and the mxu_bf16 operand flag:
    the kernel must stay close to the fp64 oracle at bf16 tolerance —
    catches dtype-handling regressions on CPU (interpret mode)."""
    from fdbm_tpu.ops.gridrnn import grid_rnn_seq1

    b, s_len, p, c, hidden = 2, 35, 12, 16, 24
    rng = np.random.default_rng(4)
    x = rng.standard_normal((b, s_len, p, c)).astype(np.float32) * 0.5
    w_ih = rng.standard_normal((2, KS * c, 4 * hidden)).astype(np.float32) * 0.2
    w_hh = rng.standard_normal((2, hidden, 4 * hidden)).astype(np.float32) * 0.2
    bias = rng.standard_normal((2, 4 * hidden)).astype(np.float32) * 0.2
    wd = rng.standard_normal((2 * hidden, KS * c)).astype(np.float32) * 0.2

    out = grid_rnn_seq1(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w_ih), jnp.asarray(w_hh),
        jnp.asarray(bias), jnp.asarray(wd), mxu_bf16=mxu_bf16)
    assert out.dtype == jnp.bfloat16  # io streams stay bf16
    got = np.asarray(out, dtype=np.float32)
    xr = np.moveaxis(x, 1, 0).reshape(s_len, b * p, c)
    want = _oracle(xr, w_ih, w_hh, bias, wd).reshape(s_len, b, p, c)
    want = np.moveaxis(want, 0, 1)

    L = s_len - (KS - 1)
    err = (np.linalg.norm(got[:, 3:L] - want[:, 3:L])
           / np.linalg.norm(want[:, 3:L]))
    assert err < 2e-2, f"bf16 canvas kernel relative error {err}"
    assert np.isfinite(got).all()


def test_pick_tile_minimises_grid_cells():
    """Round-4 regression: at the folder 5.12 s bucket (p=332) the
    waste-minimising picker chose tile 56 (six cells) and the kernel ran
    at 31.9 ms vs ~8 ms linear; cells-first picks 88 (four cells). Bench
    shapes keep their compiler-validated tile 88."""
    from fdbm_tpu.ops.gridrnn import _pick_tile

    assert _pick_tile(332, 88) == 88   # the measured pathology shape
    assert _pick_tile(262, 88) == 88   # bench intra
    assert _pick_tile(263, 88) == 88   # bench inter
    # ties on cell count break toward less pad waste
    assert _pick_tile(100, 88) == 56   # 2 cells either way; 56 wastes 12
    # p below the cap: one exact-ish tile
    assert _pick_tile(50, 88) == 56
