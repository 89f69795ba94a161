"""Differentiable fused grid-RNN Pallas kernel (train twin of ops/gridrnn.py).

The inference path fused unfold(k=4) -> BiLSTM -> deconv -> overlap-add into
one canvas-direct kernel (ops/gridrnn.py), eliminating the windows stream
([L, B', 4C], 4x the raw line bytes) and the reshape/transpose copies around
the recurrence. The TRAINING path still ran the round-1 dataflow — windows
materialised in HBM, per-direction `lstm_core` calls, XLA deconv + fold —
and the round-4 train-step profile attributed ~30% of the 103.9 ms step to
exactly that layout glue (BENCH_NOTES "training-step profile").

This module is the deferred lever named there: the same fused pipeline with
a custom VJP.

* Forward: one Pallas kernel per path (both LSTM directions advance in the
  same grid step, ops/gridrnn._advance_and_fold) which ADDITIONALLY stashes
  the PREVIOUS-step hidden/cell states per direction — exactly the
  residuals the reverse sweep needs (gate recompute is then chunk-batched,
  no sequential matmul on the recompute side).
* Backward: one Pallas kernel runs both directions' reverse sweeps — the
  model-forward direction walks blocks descending (delayed-write dx fold),
  the model-backward direction ascending (carry dx fold) — mirroring the
  forward kernel's two walk orders. Weight gradients accumulate in VMEM
  scratch across the whole (b_tile, seq_block) grid (both dims sequential,
  like ops/lstm._lstm_bwd_kernel) and flush on the final step. The unfold's
  transpose (overlap-add of per-tap dgates @ W_ih^T) reuses the fold
  pipeline; the fold's transpose (windows of dout) reuses the window build.
* Exact extents (round 5): both kernels read and write the true
  [s_true, b, C] arrays directly — clamped block index maps plus
  in-kernel select masks replace the r4 call-site zero-pads/slices
  (x pad, output crop, cotangent re-pads: five full HBM copies per
  fwd+bwd, ~6 ms of the 78 ms b2 train step — BENCH_NOTES r5).  Masks
  zero both the row overrun (>= s_true) and the batch overrun (>= b)
  of every loaded block: out-of-bounds Pallas loads are undefined, and
  an undefined NaN would otherwise reach the weight-grad accumulators
  through 0*NaN.  Out-of-range *store* steps skip their write so the
  clamp-revisited block stores its buffered content back unchanged
  (same trick as ops/gridrnn.py's exact-shaped outputs).

Gradient semantics: the VJP computes the gradient of the IDEAL
unfold->BiLSTM->deconv->fold function. The fused forward's pad-contaminated
rows (sequence rows outside [3, L-1], see ops/gridrnn.py docstring) receive
exactly ZERO cotangent in the real model graph — GridNetBlock's olp crop
discards the rows and every op between (LSTM over the other axis, LN,
residual) is row-local — so the ideal gradient IS the model gradient
(tests/test_gridrnn_train.py proves both the crop-masked oracle equality
and full-block equality against the XLA scan path).

Reference behavioural spec: fdbm/backbones/tfgridnet.py:341-392 (the
unfold/BiLSTM/ConvTranspose1d path whose autograd this replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdbm_tpu.ops.gridrnn import _KS, _fold19, _prep_weights
from fdbm_tpu.ops.lstm import LANE, _round_up, _use_interpret

Array = jnp.ndarray

_CS_F = 16   # forward-kernel sequence chunk
_CS_B = 8    # backward-kernel sequence chunk (more live temporaries)
_TILE_F = 64
_TILE_B = 32


def _windows(cur: Array, nxt: Array, cs: int) -> Array:
    """k=4 windows from two adjacent [cs, tb, C] blocks -> [cs, tb, 4C]."""
    cat = jnp.concatenate([cur, nxt[: _KS - 1]], axis=0)
    return jnp.concatenate([cat[t : t + cs] for t in range(_KS)], axis=-1)


# ---------------------------------------------------------------------------
# Forward kernel: _grid_kernel + prev-state stashes
# ---------------------------------------------------------------------------


def _fwd_kernel(xf_cur, xf_nxt, xb_cur, xb_nxt, w_comb, bias, wd,
                outf, outb, hpf, cpf, hpb, cpb,
                h_scr, c_scr, carry_f, buf_b, hbuf_f, hbuf_b,
                cbuf_f, cbuf_b, last_scr,
                *, hidden: int, cdim: int, L: int, n_real: int,
                s_true: int, b: int):
    """One (b_tile, step) on EXACT [s_true, b, C] seq-major fp32 inputs.

    Identical recurrence/fold to ops/gridrnn._grid_kernel (fp32 io), plus
    four stash outputs holding the PREVIOUS step's (h, c) per position:
    hpf[s] = h_{s-1} (forward dir), hpb[s] = h'_{s+1} (backward dir) — the
    prev-state shift happens at store time from the chunk h/c buffers and
    two [4, tile, H] cross-chunk rows (last_scr), so the step loop stays
    store-free.

    The caller no longer zero-pads x into the kernel's row space (that
    pad was a full HBM copy per call, ~1.1 ms at production shape —
    BENCH_NOTES r5 re-attribution): index maps CLAMP at the true block
    range and every loaded block is select-masked to zero outside
    [0, s_true) x [0, b) — the same clamp+mask technique as the
    inference kernel (ops/gridrnn.py:339-366).  Masking to zero is not
    just parity with the old zero-pad: out-of-bounds Pallas loads are
    UNDEFINED bytes, and a NaN there would poison the VMEM weight-grad
    accumulators through 0*NaN in the backward twin.
    """
    j = pl.program_id(1)
    bi = pl.program_id(0)
    cs = _CS_F
    tb = xf_cur.shape[1]

    rows_l = jax.lax.broadcasted_iota(jnp.int32, (cs, 1, 1), 0)
    bmask = (jax.lax.broadcasted_iota(jnp.int32, (1, tb, 1), 1)
             + bi * tb) < b

    def msk(block, base):
        ok = jnp.logical_and(rows_l + base >= 0, rows_l + base < s_true)
        return jnp.where(jnp.logical_and(ok, bmask), block, 0.0)

    @pl.when(j == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        carry_f[:] = jnp.zeros_like(carry_f)
        buf_b[:] = jnp.zeros_like(buf_b)
        last_scr[:] = jnp.zeros_like(last_scr)

    m_blk = n_real - 1 - j
    winf = _windows(msk(xf_cur[:], j * cs), msk(xf_nxt[:], (j + 1) * cs),
                    cs)
    winb = _windows(msk(xb_cur[:], m_blk * cs),
                    msk(xb_nxt[:], (m_blk + 1) * cs), cs)

    # Input projection FUSED into the recurrent matmul (one [tb, 4C+H'] x
    # [4C+H', 4H'] dot on the concatenated [window | h] rows per step) —
    # same VMEM-lean form as ops/gridrnn._advance_and_fold.
    wcf = w_comb[0]
    wcb = w_comb[1]

    def cell(g, c_prev):
        i = jax.nn.sigmoid(g[:, 0 * hidden : 1 * hidden])
        f = jax.nn.sigmoid(g[:, 1 * hidden : 2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(g[:, 3 * hidden : 4 * hidden])
        c = f * c_prev + i * gg
        return o * jnp.tanh(c), c

    m = n_real - 1 - j
    for s in range(cs):
        sb = cs - 1 - s
        h = h_scr[:]
        gf = jnp.dot(jnp.concatenate([winf[s], h[:tb]], axis=1), wcf,
                     preferred_element_type=jnp.float32) + bias[0, 0]
        gb = jnp.dot(jnp.concatenate([winb[sb], h[tb:]], axis=1), wcb,
                     preferred_element_type=jnp.float32) + bias[0, 1]
        hn_f, c_f = cell(gf, c_scr[:tb])
        hn_b, c_b = cell(gb, c_scr[tb:])
        p_b = m * cs + sb
        live_b = (p_b < L).astype(jnp.float32)
        hn_b = hn_b * live_b
        c_b = c_b * live_b
        c_scr[:tb] = c_f
        c_scr[tb:] = c_b
        h_scr[:tb] = hn_f
        h_scr[tb:] = hn_b
        hbuf_f[s] = hn_f
        hbuf_b[sb] = hn_b
        cbuf_f[s] = c_f
        cbuf_b[sb] = c_b

    # ---- prev-state stashes (skip at the fold-flush step j == n_real:
    # its clamped index maps revisit the last real block, and a revisited
    # out block writes back its buffered content unmodified) --------------
    @pl.when(j < n_real)
    def _():
        # forward dir: prev of row s is row s-1 (cross-chunk: last_scr[0/1])
        hpf[:] = jnp.concatenate([last_scr[0:1], hbuf_f[: cs - 1]], axis=0)
        cpf[:] = jnp.concatenate([last_scr[1:2], cbuf_f[: cs - 1]], axis=0)
        # backward dir: prev of row s is row s+1 (cross-chunk: the PREVIOUS
        # grid step's row 0, i.e. position (m+1)*cs, held in last_scr[2/3])
        hpb[:] = jnp.concatenate([hbuf_b[1:], last_scr[2:3]], axis=0)
        cpb[:] = jnp.concatenate([cbuf_b[1:], last_scr[3:4]], axis=0)
        last_scr[0] = hbuf_f[cs - 1]
        last_scr[1] = cbuf_f[cs - 1]
        last_scr[2] = hbuf_b[0]
        last_scr[3] = cbuf_b[0]

    # ---- deconv + software-pipelined fold (as in _advance_and_fold) ------
    wdd = wd[...]
    zf = jnp.dot(hbuf_f[:].reshape(cs * tb, hidden), wdd[0],
                 preferred_element_type=jnp.float32).reshape(cs, tb, _KS * cdim)
    zb = jnp.dot(hbuf_b[:].reshape(cs * tb, hidden), wdd[1],
                 preferred_element_type=jnp.float32).reshape(cs, tb, _KS * cdim)
    live = (j < n_real).astype(jnp.float32)
    cf = _fold19(zf, cdim, tb) * live
    cb = _fold19(zb, cdim, tb) * live
    pad13 = jnp.zeros((cs - (_KS - 1), tb, cdim), jnp.float32)
    outf_val = cf[:cs] + jnp.concatenate([carry_f[:], pad13], axis=0)
    carry_f[:] = cf[cs:]
    outb_val = buf_b[:] + jnp.concatenate([cb[cs:], pad13], axis=0)
    buf_b[:] = cb[:cs]

    # Exact-extent outputs: block indices past the last real block are
    # CLAMPED in the out index maps, so an out-of-range step revisits the
    # last real block — skip the write there and Pallas stores the
    # buffered (already-correct) content back unmodified.
    @pl.when(j * cs < s_true)
    def _():
        outf[:] = outf_val

    @pl.when((n_real - j) * cs < s_true)
    def _():
        outb[:] = outb_val


def _fwd_call(x, w_comb, bias_p, wd, *, hidden, cdim, L):
    """Pallas call for the stashing forward. x: EXACT [s_true, b, C] fp32.

    No caller-side padding: the block index maps clamp into the true
    block range of x and the kernel select-masks out-of-range loads
    (see _fwd_kernel docstring); out/dx arrays are allocated at the true
    [s_true, b] extent with clamped store maps + skipped writes, and
    Pallas drops partial-block stores at the array edge."""
    cs = _CS_F
    s_true, b, _ = x.shape
    tile = _TILE_F if b >= _TILE_F else _round_up(b, 8)
    n_real = -(-L // cs)
    nb_x = -(-s_true // cs)
    kc = _KS * cdim
    hp = hidden
    grid = (-(-b // tile), n_real + 1)

    def cur_f(i, j):
        return (jnp.minimum(j, nb_x - 1), i, 0)

    def nxt_f(i, j):
        return (jnp.minimum(j + 1, nb_x - 1), i, 0)

    def cur_b(i, j):
        return (jnp.clip(n_real - 1 - j, 0, nb_x - 1), i, 0)

    def nxt_b(i, j):
        return (jnp.clip(n_real - j, 0, nb_x - 1), i, 0)

    def stash_f(i, j):
        return (jnp.minimum(j, n_real - 1), i, 0)

    def stash_b(i, j):
        return (jnp.clip(n_real - 1 - j, 0, n_real - 1), i, 0)

    def out_f(i, j):
        return (jnp.minimum(j, nb_x - 1), i, 0)

    def out_b(i, j):
        return (jnp.clip(n_real - j, 0, nb_x - 1), i, 0)

    blk_c = (cs, tile, cdim)
    blk_h = (cs, tile, hp)
    bcast = lambda i, j: (0, 0, 0)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, hidden=hp, cdim=cdim, L=L,
                          n_real=n_real, s_true=s_true, b=b),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk_c, cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, nxt_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, nxt_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kc + hp, 4 * hp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 4 * hp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, kc), bcast, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk_c, out_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, out_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, stash_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, stash_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, stash_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, stash_b, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_true, b, cdim), jnp.float32),
            jax.ShapeDtypeStruct((s_true, b, cdim), jnp.float32),
        ] + [jax.ShapeDtypeStruct((n_real * cs, b, hp), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2 * tile, hp), jnp.float32),
            pltpu.VMEM((2 * tile, hp), jnp.float32),
            pltpu.VMEM((_KS - 1, tile, cdim), jnp.float32),
            pltpu.VMEM((cs, tile, cdim), jnp.float32),
            pltpu.VMEM((cs, tile, hp), jnp.float32),
            pltpu.VMEM((cs, tile, hp), jnp.float32),
            pltpu.VMEM((cs, tile, hp), jnp.float32),
            pltpu.VMEM((cs, tile, hp), jnp.float32),
            pltpu.VMEM((4, tile, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(x, x, x, x, w_comb, bias_p, wd)
    return outs

# ---------------------------------------------------------------------------
# Backward kernel: both directions' reverse sweeps in one grid walk
# ---------------------------------------------------------------------------


def _bwd_dir_sweep(win, dzwin, hprev, cprev, wc, wcT, wdT, bias_d,
                   live_rows, descend, dh_scr, dc_scr,
                   *, hidden: int, cdim: int):
    """One direction's reverse sweep over one chunk.

    win/dzwin: [cs, tb, 4C] input / output-cotangent windows.
    hprev/cprev: [cs, tb, H] stashed previous states (row s holds the
      state the recurrence consumed at position s).
    wc: [4C+H, 4H] combined weights; wcT: its transpose; wdT: [4C, H].
    live_rows: [cs, 1, 1] bool — position is a REAL recurrence step.
    descend: sweep the chunk rows cs-1..0 (model-forward direction) or
      0..cs-1 (model-backward direction).
    dh_scr/dc_scr: [tb, H] per-direction carry scratch refs (read+written).

    Returns (dwin, dwc_contrib, db_contrib, dwd_contrib) — all chunk-level
    contributions; dwin is the per-window x cotangent to be folded.
    """
    cs, tb, _ = win.shape
    kc = _KS * cdim
    # Chunk-batched recompute: gates for ALL rows in one MXU dot (the
    # sequential dependency is satisfied by the stashed hprev).
    xh = jnp.concatenate([win, hprev], axis=-1)  # [cs, tb, 4C+H]
    gates = jnp.dot(xh.reshape(cs * tb, kc + hidden), wc,
                    preferred_element_type=jnp.float32) + bias_d
    gates = gates.reshape(cs, tb, 4 * hidden)
    i = jax.nn.sigmoid(gates[..., 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[..., 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden : 4 * hidden])
    c = f * cprev + i * g
    tc = jnp.tanh(c)
    h_cur = o * tc

    # dz rows at non-live positions carry REAL dout values (the window
    # overruns the valid range) — mask them out of every use.
    dzm = jnp.where(live_rows, dzwin, 0.0)
    dh_direct = jnp.dot(dzm.reshape(cs * tb, kc), wdT,
                        preferred_element_type=jnp.float32
                        ).reshape(cs, tb, hidden)

    whhT = wcT[:, kc:]  # [4H, H]
    order = range(cs - 1, -1, -1) if descend else range(cs)
    dgates_rows = [None] * cs
    dh = dh_scr[:]
    dc_carry = dc_scr[:]
    for s in order:
        live = live_rows[s]
        dh_s = dh_direct[s] + dh
        do_ = dh_s * tc[s]
        dc = dh_s * o[s] * (1.0 - tc[s] * tc[s]) + dc_carry
        dgates_s = jnp.concatenate([
            dc * g[s] * i[s] * (1.0 - i[s]),
            dc * cprev[s] * f[s] * (1.0 - f[s]),
            dc * i[s] * (1.0 - g[s] * g[s]),
            do_ * o[s] * (1.0 - o[s]),
        ], axis=-1)
        dgates_s = jnp.where(live, dgates_s, 0.0)
        dgates_rows[s] = dgates_s
        dh = jnp.dot(dgates_s, whhT, preferred_element_type=jnp.float32)
        dc_carry = jnp.where(live, dc * f[s], 0.0)
    dh_scr[:] = dh
    dc_scr[:] = dc_carry

    dgates = jnp.stack(dgates_rows, axis=0)  # [cs, tb, 4H]
    dgf = dgates.reshape(cs * tb, 4 * hidden)
    # dx windows + weight grads, chunk-batched on the MXU.
    dwin = jnp.dot(dgf, wcT[:, :kc],
                   preferred_element_type=jnp.float32).reshape(cs, tb, kc)
    dwc = jnp.dot(xh.reshape(cs * tb, kc + hidden).T, dgf,
                  preferred_element_type=jnp.float32)
    db = jnp.sum(dgf, axis=0, keepdims=True)
    dwd = jnp.dot(h_cur.reshape(cs * tb, hidden).T,
                  dzm.reshape(cs * tb, kc),
                  preferred_element_type=jnp.float32)
    return dwin, dwc, db, dwd


def _bwd_kernel(xf_cur, xf_nxt, dof_cur, dof_nxt, hpf, cpf,
                xb_cur, xb_nxt, dob_cur, dob_nxt, hpb, cpb,
                w_comb, bias, wcombT, wdT,
                dxf, dxb, dwc_out, db_out, dwd_out,
                dh_f, dc_f, dh_b, dc_b,
                dwc_scr, db_scr, dwd_scr, buf_f, carry_b,
                *, hidden: int, cdim: int, L: int, n_real: int,
                s_true: int, b: int):
    """One (b_tile, step) of the fused backward. Grid dims BOTH sequential:
    weight-grad scratch accumulates across every cell and flushes once.

    Step j: the model-FORWARD direction reverse-sweeps z-block
    m = n_real-1-j (descending; its dx fold delayed-writes block m+1), the
    model-BACKWARD direction sweeps z-block j (ascending; immediate write
    with a 3-row spill carry). Step j == n_real flushes both pipelines.
    """
    bi = pl.program_id(0)
    j = pl.program_id(1)
    cs = _CS_B
    tb = xf_cur.shape[1]
    first = jnp.logical_and(bi == 0, j == 0)

    @pl.when(j == 0)
    def _():
        dh_f[:] = jnp.zeros_like(dh_f)
        dc_f[:] = jnp.zeros_like(dc_f)
        dh_b[:] = jnp.zeros_like(dh_b)
        dc_b[:] = jnp.zeros_like(dc_b)
        buf_f[:] = jnp.zeros_like(buf_f)
        carry_b[:] = jnp.zeros_like(carry_b)

    @pl.when(first)
    def _():
        dwc_scr[:] = jnp.zeros_like(dwc_scr)
        db_scr[:] = jnp.zeros_like(db_scr)
        dwd_scr[:] = jnp.zeros_like(dwd_scr)

    m = n_real - 1 - j
    rows = jax.lax.broadcasted_iota(jnp.int32, (cs, 1, 1), 0)
    # batch-validity folds into the live masks (so invalid batch lanes'
    # dgates/dz zero out of the VMEM weight-grad accumulation) AND into
    # the input loads (an out-of-bounds load is undefined — a NaN there
    # would survive 0*NaN into the accumulators).
    bmask = (jax.lax.broadcasted_iota(jnp.int32, (1, tb, 1), 1)
             + bi * tb) < b
    live_f = jnp.logical_and(
        jnp.logical_and(rows + m * cs < L, m >= 0), bmask)
    live_b = jnp.logical_and(rows + j * cs < L, bmask)
    # j == n_real rows start at n_real*cs >= L (dead under live_b)

    def msk(block, base):
        ok = jnp.logical_and(rows + base >= 0, rows + base < s_true)
        return jnp.where(jnp.logical_and(ok, bmask), block, 0.0)

    def bmsk(block):
        # where, not multiply: an undefined load can be NaN and NaN*0=NaN
        return jnp.where(bmask, block, 0.0)

    dwin_f, dwc_f, db_f, dwd_f = _bwd_dir_sweep(
        _windows(msk(xf_cur[:], m * cs), msk(xf_nxt[:], (m + 1) * cs), cs),
        _windows(msk(dof_cur[:], m * cs), msk(dof_nxt[:], (m + 1) * cs),
                 cs),
        bmsk(hpf[:]), bmsk(cpf[:]),
        w_comb[0], wcombT[0], wdT[0], bias[0, 0],
        live_f, True, dh_f, dc_f, hidden=hidden, cdim=cdim)
    dwin_b, dwc_b, db_b, dwd_b = _bwd_dir_sweep(
        _windows(msk(xb_cur[:], j * cs), msk(xb_nxt[:], (j + 1) * cs), cs),
        _windows(msk(dob_cur[:], j * cs), msk(dob_nxt[:], (j + 1) * cs),
                 cs),
        bmsk(hpb[:]), bmsk(cpb[:]),
        w_comb[1], wcombT[1], wdT[1], bias[0, 1],
        live_b, False, dh_b, dc_b, hidden=hidden, cdim=cdim)

    dwc_scr[0] += dwc_f
    dwc_scr[1] += dwc_b
    db_scr[0, 0] += db_f[0]
    db_scr[0, 1] += db_b[0]
    dwd_scr[0] += dwd_f
    dwd_scr[1] += dwd_b

    # ---- fold the window cotangents back onto the x rows -----------------
    cf = _fold19(dwin_f, cdim, tb)  # rows [m*cs, (m+1)*cs + 3)
    cb = _fold19(dwin_b, cdim, tb)  # rows [j*cs, (j+1)*cs + 3)
    pad13 = jnp.zeros((cs - (_KS - 1), tb, cdim), jnp.float32)
    # forward dir walks blocks DESCENDING: block m's top 3 rows spill into
    # block m+1, which was processed last step and sits buffered. Write
    # block m+1 now; hold block m's body.
    dxf_val = buf_f[:] + jnp.concatenate([cf[cs:], pad13], axis=0)
    buf_f[:] = cf[:cs]
    # backward dir walks ASCENDING: standard carry pipeline.
    dxb_val = cb[:cs] + jnp.concatenate([carry_b[:], pad13], axis=0)
    carry_b[:] = cb[cs:]

    # Exact-extent dx: skip writes whose (clamped) out block is past the
    # last real block (see _fwd_kernel — revisited blocks store their
    # buffered content back unmodified).
    @pl.when((n_real - j) * cs < s_true)
    def _():
        dxf[:] = dxf_val

    @pl.when(j * cs < s_true)
    def _():
        dxb[:] = dxb_val

    last = jnp.logical_and(bi == pl.num_programs(0) - 1,
                           j == pl.num_programs(1) - 1)

    @pl.when(last)
    def _():
        dwc_out[:] = dwc_scr[:]
        db_out[:] = db_scr[:]
        dwd_out[:] = dwd_scr[:]


def _tile_for(bp: int, cap: int) -> int:
    """Largest multiple of 8 <= cap that divides bp (bp is a multiple of 8)."""
    for t in range(min(cap, bp), 7, -8):
        if bp % t == 0:
            return t
    return 8


def _bwd_call(x, doutf, doutb, hpf, cpf, hpb, cpb, w_comb, bias_p, wd,
              *, hidden, cdim, L):
    """Pallas call for the fused backward.

    x/doutf/doutb: EXACT [s_true, b, C] fp32 (no caller-side padding —
    clamped index maps + in-kernel select masks, see _fwd_kernel);
    stashes: [n_real_f * _CS_F, b, H]. Returns (dxf, dxb, dwcomb, dbias,
    dwd) — dx split per direction (summed by the caller, XLA fuses it into
    the consumer), weight grads in the PADDED layouts of _prep_weights.
    """
    cs = _CS_B
    s_true, b, _ = x.shape
    tile = _TILE_B if b >= _TILE_B else _round_up(b, 8)
    n_real = -(-L // cs)
    nb_x = -(-s_true // cs)
    kc = _KS * cdim
    hp = hidden
    wcombT = jnp.swapaxes(w_comb, 1, 2)  # [2, 4H, 4C+H]
    wdT = jnp.swapaxes(wd, 1, 2)         # [2, 4C, H]
    grid = (-(-b // tile), n_real + 1)

    blk_c = (cs, tile, cdim)
    blk_h = (cs, tile, hp)
    bcast3 = lambda i, j: (0, 0, 0)

    # Model-FORWARD direction sweeps blocks descending (m = n_real-1-j);
    # model-BACKWARD direction ascends (block j).  All row streams clamp
    # into x's true block range; the kernel masks out-of-range loads.
    def cur_f(i, j):
        return (jnp.clip(n_real - 1 - j, 0, nb_x - 1), i, 0)

    def nxt_f(i, j):
        return (jnp.clip(n_real - j, 0, nb_x - 1), i, 0)

    def cur_b(i, j):
        return (jnp.minimum(j, nb_x - 1), i, 0)

    def nxt_b(i, j):
        return (jnp.minimum(j + 1, nb_x - 1), i, 0)

    def stash_b(i, j):
        return (jnp.minimum(j, n_real - 1), i, 0)

    def dx_f(i, j):
        return (jnp.clip(n_real - j, 0, nb_x - 1), i, 0)

    def dx_b(i, j):
        return (jnp.minimum(j, nb_x - 1), i, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, hidden=hp, cdim=cdim, L=L,
                          n_real=n_real, s_true=s_true, b=b),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk_c, cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, nxt_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, nxt_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, nxt_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, nxt_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, stash_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_h, stash_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kc + hp, 4 * hp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 4 * hp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * hp, kc + hp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kc, hp), bcast3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk_c, dx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_c, dx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kc + hp, 4 * hp), bcast3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 4 * hp), bcast3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, kc), bcast3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_true, b, cdim), jnp.float32),
            jax.ShapeDtypeStruct((s_true, b, cdim), jnp.float32),
            jax.ShapeDtypeStruct((2, kc + hp, 4 * hp), jnp.float32),
            jax.ShapeDtypeStruct((1, 2, 4 * hp), jnp.float32),
            jax.ShapeDtypeStruct((2, hp, kc), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, hp), jnp.float32),
            pltpu.VMEM((tile, hp), jnp.float32),
            pltpu.VMEM((tile, hp), jnp.float32),
            pltpu.VMEM((tile, hp), jnp.float32),
            pltpu.VMEM((2, kc + hp, 4 * hp), jnp.float32),
            pltpu.VMEM((1, 2, 4 * hp), jnp.float32),
            pltpu.VMEM((2, hp, kc), jnp.float32),
            pltpu.VMEM((cs, tile, cdim), jnp.float32),
            pltpu.VMEM((_KS - 1, tile, cdim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(x, x, doutf, doutf, hpf, cpf,
      x, x, doutb, doutb, hpb, cpb,
      w_comb, bias_p, wcombT, wdT)


# ---------------------------------------------------------------------------
# custom-VJP core + public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(dims, x, w_comb, bias_p, wd):
    hidden, cdim, L = dims
    outf, outb, *_ = _fwd_call(x, w_comb, bias_p, wd, hidden=hidden,
                               cdim=cdim, L=L)
    return outf, outb


def _core_fwd(dims, x, w_comb, bias_p, wd):
    hidden, cdim, L = dims
    outf, outb, hpf, cpf, hpb, cpb = _fwd_call(
        x, w_comb, bias_p, wd, hidden=hidden, cdim=cdim, L=L)
    return (outf, outb), (x, w_comb, bias_p, wd, hpf, cpf, hpb, cpb)


def _core_bwd(dims, res, cot):
    hidden, cdim, L = dims
    x, w_comb, bias_p, wd, hpf, cpf, hpb, cpb = res
    doutf, doutb = cot
    # No re-padding: forward and backward kernels both read the exact
    # [s_true, b, C] extents directly (the r4 version re-materialised x
    # and both cotangents into the backward chunking's padded row space —
    # three full HBM copies per call).
    dxf, dxb, dwcomb, dbias, dwd = _bwd_call(
        x, doutf, doutb, hpf, cpf, hpb, cpb, w_comb, bias_p, wd,
        hidden=hidden, cdim=cdim, L=L)
    return dxf + dxb, dwcomb, dbias, dwd


_core.defvjp(_core_fwd, _core_bwd)


def grid_fold_train_pair(x: Array, w_ih: Array, w_hh: Array, bias: Array,
                         w_deconv: Array):
    """Differentiable fused unfold(k=4) -> BiLSTM -> deconv -> overlap-add.

    Train twin of ops/gridrnn.grid_rnn_seq1_pair on SEQ-MAJOR lines.

    Args:
      x: [S, B, C] fp32 sequence-major raw lines (already LayerNorm'd and
        spatially padded by the caller). C must be a multiple of 8.
      w_ih: [2, 4*C, 4H]; w_hh: [2, H, 4H]; bias: [2, 4H] (i,f,g,o);
      w_deconv: [2H, 4*C] (rows 0:H forward, H:2H backward; tap-major
        output channels) — the same parameter layouts as the unfused path.

    Returns:
      (outf, outb): per-direction folded [S, B, C] fp32 (no deconv bias —
      it commutes and the caller fuses it with the residual add). Sequence
      rows outside [3, L-1] are pad-contaminated exactly like the
      inference kernel; GridNetBlock's olp crop discards them, and those
      rows receive zero cotangent in the model graph (module docstring).

    Weight/bias/x gradients flow through a custom VJP whose reverse-sweep
    kernel mirrors the forward's two walk orders; the padded-layout weight
    cotangents un-pad automatically through _prep_weights' autodiff.
    """
    s_true, b, cdim = x.shape
    hidden = w_hh.shape[1]
    L = s_true - (_KS - 1)
    assert L >= 1, "sequence too short for k=4 unfold"
    assert cdim % 8 == 0, "channel dim must be a multiple of 8"
    hp = _round_up(hidden, LANE)
    w_comb, bias_p, wd = _prep_weights(w_ih, w_hh, bias, w_deconv, hidden, hp)

    # Exact extents end to end: no x zero-pad into the kernel row space,
    # no output crop — and therefore no pad of the output cotangent on
    # the way back (clamped index maps + in-kernel select masks replace
    # all of them; BENCH_NOTES r5 measured the pads/slices at ~6 ms of
    # the 78 ms train step).
    dims = (hp, cdim, L)
    return _core(dims, x.astype(jnp.float32), w_comb.astype(jnp.float32),
                 bias_p.astype(jnp.float32), wd.astype(jnp.float32))
