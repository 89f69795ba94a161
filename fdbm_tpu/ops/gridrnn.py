"""Fused TF-GridNet RNN-path Pallas kernel: unfold + BiLSTM + deconv + fold.

The TF-GridNet dual-path block runs, per direction (reference
fdbm/backbones/tfgridnet.py:341-392):

    unfold(k=4, s=1) -> BiLSTM -> ConvTranspose1d(k=4, s=1)   (overlap-add)

On TPU this program is HBM-bandwidth-bound (BENCH_NOTES roofline), and the
round-1/2 dataflow moved the 4x-unfolded input stream ([L, B', 4C]) and the
2H-wide hidden-state stream through HBM around the LSTM kernel. This kernel
fuses the whole path so HBM only carries the RAW C-wide line in and the
folded C-wide line out:

  * the unfold never exists in HBM: each grid step reads two adjacent
    C-wide input blocks and builds the k=4 windows in VMEM by lane
    concatenation;
  * both LSTM directions advance in the same kernel step (stacked
    [2*tile_b, 4H] gate math, like ops/lstm.bilstm_fused_forward); the
    backward direction reads input blocks through a descending index map
    and keeps its carry zeroed while in the padded tail, so no separately
    front-padded input copy is needed;
  * the deconv projection (Dense 2H -> k*C, no bias) happens in-kernel on
    the chunk's hidden states, split per direction (rows 0:H of the Dense
    kernel act on the forward states, rows H:2H on the backward states);
  * the k-tap overlap-add fold is software-pipelined across grid steps
    with a 3-row spill carry (forward: same-step write; backward: the
    write of output block m+1 happens one step delayed, when block m's
    spill into it is known).

Exactness: the returned rows [3, L-1] (L = seq-3) are bit-comparable to the
unfused pipeline; rows 0..2 and L..seq-1 are contaminated by sequence-pad
garbage (backward-direction z values at padded positions fold into the
first 3 rows; forward ones into the last 3). GridNetBlock crops exactly to
rows [olp, olp+dim-1] = [3, seq-4] of the padded array, so the contaminated
rows never reach the model output — see tests/test_gridrnn.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdbm_tpu.ops.lstm import LANE, _pad_gate_cols, _round_up, _use_interpret

Array = jnp.ndarray

_KS = 4  # unfold kernel size (emb_ks, reference tfgridnet.py)
_CHUNK = 16


def _fold19(z: Array, c: int, tb: int) -> Array:
    """Overlap-add the k=4 taps of a z chunk.

    z: [_CHUNK, tb, 4*c] tap-major (tap slow, channel fast).
    Returns [_CHUNK + 3, tb, c]: row r = sum_j z[r-j, :, j*c:(j+1)*c].
    """
    acc = None
    for tap in range(_KS):
        zj = z[:, :, tap * c : (tap + 1) * c]
        segs = []
        if tap:  # Mosaic rejects zero-sized vector operands
            segs.append(jnp.zeros((tap, tb, c), z.dtype))
        segs.append(zj)
        if _KS - 1 - tap:
            segs.append(jnp.zeros((_KS - 1 - tap, tb, c), z.dtype))
        part = jnp.concatenate(segs, axis=0)
        acc = part if acc is None else acc + part
    return acc


def _advance_and_fold(winf, winb, w_comb, bias, wd, store_f, store_b,
                      h_scr, c_scr, carry_f, buf_b, hbuf_f, hbuf_b,
                      *, hidden: int, cdim: int, L: int, n_real: int,
                      j, m, mm_dt, io_dt):
    """Shared per-grid-step core: gates projection -> stacked-bidirectional
    LSTM chunk -> deconv projection -> software-pipelined overlap-add.

    winf/winb: [cs, tb, 4C] k=4 windows (s-major). ``store_f(val)`` /
    ``store_b(val)`` write a [cs, tb, C] value into the caller's output
    ref(s) (separate-array vs accumulate-in-place layouts differ per
    caller). Step j < n_real: advance both directions over z block j
    (forward) / block m = n_real-1-j (backward); write folded-forward
    block j and folded-backward block m+1. Step j == n_real: flush the
    pipelines (forward spill block n_real, backward buffered block 0).
    """
    cs = _CHUNK
    tb = winf.shape[1]

    # The chunk input projection is FUSED into the recurrent matmul:
    # per step, one [tb, 4C+H'] x [4C+H', 4H'] dot on the concatenated
    # [x_window | h] row block against the stacked [W_ih; W_hh] weights
    # (identical sums — MXU accumulates along K). This removes the two
    # [cs, tb, 4H'] fp32 pre-activation buffers that were the largest
    # VMEM stack temporaries (they priced the seq-resident output block
    # out of the 16 MB scoped budget at tile 88), and deepens the MXU
    # contraction from 128 to 256 rows per recurrence step.
    wcf = w_comb[0].astype(mm_dt)
    wcb = w_comb[1].astype(mm_dt)
    bias_f, bias_b = bias[0, 0], bias[0, 1]

    def lstm_cell(g, c_prev):
        i = jax.nn.sigmoid(g[:, 0 * hidden : 1 * hidden])
        f = jax.nn.sigmoid(g[:, 1 * hidden : 2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(g[:, 3 * hidden : 4 * hidden])
        c = f * c_prev + i * gg
        return o * jnp.tanh(c), c

    for s in range(cs):
        sb = cs - 1 - s
        h = h_scr[:].astype(mm_dt)
        gf = jnp.dot(jnp.concatenate([winf[s], h[:tb]], axis=1), wcf,
                     preferred_element_type=jnp.float32) + bias_f
        gb = jnp.dot(jnp.concatenate([winb[sb], h[tb:]], axis=1), wcb,
                     preferred_element_type=jnp.float32) + bias_b
        hn_f, c_f = lstm_cell(gf, c_scr[:tb])
        hn_b, c_b = lstm_cell(gb, c_scr[tb:])
        # Backward carry stays zero while its position is in the padded
        # tail (p >= L), so it enters the last REAL row (p == L-1) fresh —
        # this replaces round-2's separately front-padded input copy.
        # live_b is a per-step scalar, so only the backward half pays the
        # masking multiply (the old stacked [2tb] mask built two concats
        # and masked both directions every step).
        p_b = m * cs + sb
        live_b = (p_b < L).astype(jnp.float32)
        hn_b = hn_b * live_b
        c_scr[:tb] = c_f
        c_scr[tb:] = c_b * live_b
        h_scr[:tb] = hn_f
        h_scr[tb:] = hn_b
        hbuf_f[s] = hn_f.astype(hbuf_f.dtype)
        hbuf_b[sb] = hn_b.astype(hbuf_b.dtype)

    # ---- in-kernel deconv projection + fold pipeline --------------------
    wdd = wd[...]
    if hbuf_f.dtype == jnp.bfloat16:
        wdd = wdd.astype(mm_dt)
    zf = jnp.dot(hbuf_f[:].reshape(cs * tb, hidden), wdd[0],
                 preferred_element_type=jnp.float32).reshape(cs, tb, _KS * cdim)
    zb = jnp.dot(hbuf_b[:].reshape(cs * tb, hidden), wdd[1],
                 preferred_element_type=jnp.float32).reshape(cs, tb, _KS * cdim)
    live = (j < n_real).astype(jnp.float32)
    cf = _fold19(zf, cdim, tb) * live  # [cs+3, tb, C]
    cb = _fold19(zb, cdim, tb) * live

    pad13 = jnp.zeros((cs - (_KS - 1), tb, cdim), jnp.float32)
    # forward: block j = cf[0:16] + spill-from-below at rows 0..2
    store_f((cf[:cs] + jnp.concatenate([carry_f[:], pad13], axis=0)
             ).astype(io_dt))
    carry_f[:] = cf[cs:]
    # backward: block m+1 = held c_{m+1}[0:16] + current spill c_m[16:19]
    store_b((buf_b[:] + jnp.concatenate([cb[cs:], pad13], axis=0)
             ).astype(io_dt))
    buf_b[:] = cb[:cs]


def _reset_carries(j, h_scr, c_scr, carry_f, buf_b):
    @pl.when(j == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        carry_f[:] = jnp.zeros_like(carry_f)
        buf_b[:] = jnp.zeros_like(buf_b)


def _prep_weights(w_ih, w_hh, bias, w_deconv, hidden, hp):
    """Zero-pad gate columns H -> H' (and w_hh/w_deconv rows) per direction,
    and stack [W_ih; W_hh] into the combined [2, 4C+H', 4H'] recurrence
    weight the fused per-step dot consumes."""
    w_ih_p = jnp.stack([_pad_gate_cols(w_ih[z], hidden, hp) for z in range(2)])
    w_hh_p = jnp.stack([_pad_gate_cols(w_hh[z], hidden, hp) for z in range(2)])
    bias_p = jnp.stack([_pad_gate_cols(bias[z][None, :], hidden, hp)[0]
                        for z in range(2)])[None]  # [1, 2, 4H']
    if hp != hidden:
        w_hh_p = jnp.pad(w_hh_p, ((0, 0), (0, hp - hidden), (0, 0)))
    wd = jnp.stack([
        jnp.pad(w_deconv[:hidden], ((0, hp - hidden), (0, 0))),
        jnp.pad(w_deconv[hidden:], ((0, hp - hidden), (0, 0))),
    ])  # [2, H', 4C]
    w_comb = jnp.concatenate([w_ih_p, w_hh_p], axis=1)  # [2, 4C+H', 4H']
    return w_comb, bias_p, wd


def _grid_kernel(xf_cur, xf_nxt, xb_cur, xb_nxt, w_comb, bias, wd,
                 outf, outb, h_scr, c_scr, carry_f, buf_b, hbuf_f, hbuf_b,
                 *, hidden: int, cdim: int, L: int, n_real: int,
                 mxu_bf16: bool):
    """One (b_tile, step) of the fused grid RNN on [S, B', C] inputs."""
    j = pl.program_id(1)
    io_dt = outf.dtype
    mm_dt = jnp.bfloat16 if (mxu_bf16 or io_dt == jnp.bfloat16) else jnp.float32
    _reset_carries(j, h_scr, c_scr, carry_f, buf_b)

    # ---- build k=4 windows in VMEM (lane concat of shifted C-slices) ----
    def windows(cur, nxt):
        cat = jnp.concatenate([cur, nxt[:_KS - 1]], axis=0)  # [cs+3, tb, C]
        return jnp.concatenate(
            [cat[t : t + _CHUNK] for t in range(_KS)], axis=-1)

    _advance_and_fold(
        windows(xf_cur[:], xf_nxt[:]).astype(mm_dt),
        windows(xb_cur[:], xb_nxt[:]).astype(mm_dt),
        w_comb, bias, wd,
        lambda val: outf.__setitem__(slice(None), val),
        lambda val: outb.__setitem__(slice(None), val),
        h_scr, c_scr, carry_f, buf_b, hbuf_f, hbuf_b,
        hidden=hidden, cdim=cdim, L=L, n_real=n_real,
        j=j, m=n_real - 1 - j, mm_dt=mm_dt, io_dt=io_dt)


@functools.partial(jax.jit, static_argnames=("mxu_bf16",))
def grid_bilstm_fold(x: Array, w_ih: Array, w_hh: Array, bias: Array,
                     w_deconv: Array, mxu_bf16: bool = False) -> Array:
    """Fused unfold(k=4) -> BiLSTM -> deconv(k=4) -> overlap-add.

    Args:
      x: [S, B, C] sequence-major raw lines (already LayerNorm'd and
        spatially padded by the caller). C must be a multiple of 8.
      w_ih: [2, 4*C, 4H] BiLSTM input weights (tap-major rows, dir 0=fwd).
      w_hh: [2, H, 4H]; bias: [2, 4H] (gate order i,f,g,o).
      w_deconv: [2H, 4*C] Dense kernel (rows 0:H forward, H:2H backward;
        output channels tap-major like the unfused `deconv` Dense).

    Returns:
      [S, B, C] folded output, exact on rows [3, L-1] (L = S-3); rows
      outside carry sequence-pad contamination and must be cropped by the
      caller (GridNetBlock's olp crop does exactly this). No deconv bias —
      the caller adds it (it is per output position, so it commutes).
    """
    s_len, b, cdim = x.shape
    hidden = w_hh.shape[1]
    io_dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    L = s_len - (_KS - 1)
    assert L >= 1, "sequence too short for k=4 unfold"
    assert cdim % 8 == 0, "channel dim must be a multiple of 8"

    hp = _round_up(hidden, LANE)
    kc = _KS * cdim
    w_comb, bias_p, wd = _prep_weights(
        w_ih, w_hh, bias, w_deconv, hidden, hp)

    # Batch tile: bigger tiles mean fewer sequential (tile, chunk) steps but
    # proportionally wider per-step VPU gate ops — measured NEUTRAL across
    # 32/64/128/256 on v5e (the kernel is VPU-throughput-bound, and total
    # gate work is tile-invariant; BENCH_NOTES round-2). 64 is the safe
    # VMEM default.
    tile_b = min(_round_up(b, 8), 64)
    bp = _round_up(b, tile_b)
    sp = _round_up(L, _CHUNK)
    n_real = sp // _CHUNK
    # n_real+2 input blocks so the `next` stream never reads out of bounds.
    rows = (n_real + 2) * _CHUNK
    x = jnp.pad(x, ((0, rows - s_len), (0, bp - b), (0, 0)))

    grid = (bp // tile_b, n_real + 1)

    def cur_f(i, j):
        return (j, i, 0)

    def nxt_f(i, j):
        return (j + 1, i, 0)

    def cur_b(i, j):
        return (jnp.maximum(n_real - 1 - j, 0), i, 0)

    def nxt_b(i, j):
        return (jnp.maximum(n_real - j, 0), i, 0)

    outf, outb = pl.pallas_call(
        functools.partial(_grid_kernel, hidden=hp, cdim=cdim, L=L,
                          n_real=n_real, mxu_bf16=mxu_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK, tile_b, cdim), cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, tile_b, cdim), nxt_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, tile_b, cdim), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, tile_b, cdim), nxt_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kc + hp, 4 * hp), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 4 * hp), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, kc), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK, tile_b, cdim), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, tile_b, cdim),
                         lambda i, j: (n_real - j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(((n_real + 1) * _CHUNK, bp, cdim), io_dt),
            jax.ShapeDtypeStruct(((n_real + 1) * _CHUNK, bp, cdim), io_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * tile_b, hp), jnp.float32),
            pltpu.VMEM((2 * tile_b, hp), jnp.float32),
            pltpu.VMEM((_KS - 1, tile_b, cdim), jnp.float32),
            pltpu.VMEM((_CHUNK, tile_b, cdim), jnp.float32),
            pltpu.VMEM((_CHUNK, tile_b, hp), jnp.float32),
            pltpu.VMEM((_CHUNK, tile_b, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(x.astype(io_dt), x.astype(io_dt), x.astype(io_dt), x.astype(io_dt),
      w_comb.astype(jnp.float32),
      bias_p.astype(jnp.float32), wd.astype(jnp.float32))

    return (outf[:s_len, :b] + outb[:s_len, :b]).astype(io_dt)



# ---------------------------------------------------------------------------
# Canvas-direct variant: same fused pipeline, reading the padded 4D
# [B, S, P, C] canvas directly (sequence on axis 1) with no host-side
# reshape/transpose copies.
# ---------------------------------------------------------------------------
#
# Device profile of the 30-step enhance (BENCH_NOTES round-2b): the
# [S, B', C] kernel forced every _RnnPath to materialise reshape-copy +
# transpose-copy on the way in and out (~2s/call of pure layout glue).
# This variant's BlockSpecs tile the canvas as (1, seq-chunk, batch-tile, C)
# blocks, so the kernel consumes exactly the tensor the model holds. The
# caller orients the canvas so the sequence axis is axis 1 (GridNetBlock
# swaps (1,2) ONCE between the intra and inter paths — 2 canvas copies per
# block instead of 6). LayerNorm / residual / deconv-bias stay outside as
# one fused XLA elementwise pass each (measured cheaper than in-kernel
# lane-reductions at C=32).
#
# Out-of-bounds loads (partial tail blocks on either axis) may contain
# undefined values: sequence-tail rows are select-masked to zero before the
# window build (NaN-safe), and batch-tail garbage stays in its own rows
# (every kernel op is row-independent) and is cropped by the caller.


def _canvas_kernel(xf_cur, xf_nxt, xb_cur, xb_nxt, w_comb, bias, wd,
                   outf, outb, h_scr, c_scr, carry_f, buf_b, hbuf_f, hbuf_b,
                   *, hidden: int, cdim: int, L: int, n_real: int,
                   n_out: int, s_true: int, mxu_bf16: bool):
    """One (b, tile, step) of the canvas grid RNN. Blocks: [1, cs, tb, C].

    (A single accumulated output was prototyped in round 3 — seq-resident
    VMEM block and scratch+manual-DMA variants — but a revisited output
    block prices tile 88 out of the 16 MB scoped-VMEM budget and manual
    HBM DMA requires 128-aligned minor dims, which C=32 is not. Two
    per-direction outputs with XLA's crop-add stay.)"""
    j = pl.program_id(2)
    cs = _CHUNK
    io_dt = outf.dtype
    mm_dt = jnp.bfloat16 if (mxu_bf16 or io_dt == jnp.bfloat16) else jnp.float32
    _reset_carries(j, h_scr, c_scr, carry_f, buf_b)

    def windows(cur, nxt, r0):
        cat = jnp.concatenate([cur[0], nxt[0][:_KS - 1]], axis=0)
        # Select-mask rows at/after the true sequence end: the tail block
        # may be a partial (out-of-bounds) load with undefined values.
        rows = jax.lax.broadcasted_iota(jnp.int32, (cs + _KS - 1, 1, 1), 0)
        cat = jnp.where(rows + r0 < s_true, cat, 0)
        return jnp.concatenate(
            [cat[t : t + cs] for t in range(_KS)], axis=-1)  # [cs, tb, 4C]

    # Forward writes block j at step j; backward writes block n_real-j.
    # The outputs are allocated at the TRUE [s_true, p_true] extent
    # (round-3: the former (n_real+1)*_CHUNK x n_tiles*tile allocation
    # forced XLA to crop-add the pair at a measured ~27 GB/s — slice_add
    # was 7.9 ms/forward). Steps whose target block lies entirely past
    # the last real block (forward flush when content ends earlier,
    # backward warmup) have their index map CLAMPED to the last block and
    # their store skipped: a skipped store writes the buffer back
    # unmodified (fetch semantics) or coalesces with the real write of
    # the same block index (revisit semantics) — correct either way.
    def store_f(val):
        @pl.when(j < n_out)
        def _():
            outf[0] = val

    def store_b(val):
        @pl.when(j > n_real - n_out)
        def _():
            outb[0] = val

    m = n_real - 1 - j  # backward z block (garbage at j == n_real)
    _advance_and_fold(
        windows(xf_cur, xf_nxt, j * cs).astype(mm_dt),
        windows(xb_cur, xb_nxt, m * cs).astype(mm_dt),
        w_comb, bias, wd, store_f, store_b,
        h_scr, c_scr, carry_f, buf_b, hbuf_f, hbuf_b,
        hidden=hidden, cdim=cdim, L=L, n_real=n_real,
        j=j, m=m, mm_dt=mm_dt, io_dt=io_dt)


def _pick_tile(p: int, max_tile: int) -> int:
    """Tile (multiple of 8, <= max) minimising the GRID CELL COUNT over
    p, tie-broken by pad waste.

    The former waste-minimising objective was a measured pathology: at
    the folder 5.12 s bucket (p=332) it picked tile 56 (waste 4, SIX
    tiles) over tile 88 (waste 20, FOUR tiles), and the kernel's
    per-cell fixed costs (input-block DMAs, pipeline ramp, per-step dot
    latency at narrow row counts) blew the per-path kernel time from the
    ~8 ms linear expectation to a profiled 31.9 ms — 2.1x on the whole
    batch. Cells are expensive, pad rows are cheap (they ride along the
    same VPU ops).
    """
    best, best_key = 8, (float("inf"), float("inf"))
    for t in range(8, max_tile + 1, 8):
        n = -(-p // t)
        key = (n, n * t - p)
        if key <= best_key:  # <=: prefer the larger tile on ties
            best, best_key = t, key
    return min(best, _round_up(p, 8))


def grid_rnn_seq1(x: Array, w_ih: Array, w_hh: Array, bias: Array,
                  w_deconv: Array, mxu_bf16: bool = False) -> Array:
    """Fused canvas grid-RNN; see :func:`_grid_rnn_seq1`.

    Reads the FDBM_TPU_GRIDRNN_TILE env knob OUTSIDE the jitted function
    and passes it as a static argument, so changing it after a shape has
    been traced correctly retraces instead of being silently ignored."""
    outf, outb = grid_rnn_seq1_pair(x, w_ih, w_hh, bias, w_deconv,
                                    mxu_bf16=mxu_bf16)
    return (outf + outb).astype(outf.dtype)


def grid_rnn_seq1_pair(x: Array, w_ih: Array, w_hh: Array, bias: Array,
                       w_deconv: Array, mxu_bf16: bool = False):
    """Like :func:`grid_rnn_seq1` but returns the UNSUMMED per-direction
    outputs ``(outf, outb)`` so the caller can fold the directional sum
    into its own bias + residual elementwise pass (device-profiled: the
    separate ``outf+outb`` pass plus the caller's ``+bias+residual`` pass
    cost two full canvas read/writes per path; one fused pass saves
    ~0.7 ms/forward on the 30-step enhance program)."""
    tile_cap = int(os.environ.get("FDBM_TPU_GRIDRNN_TILE", "88"))
    return _grid_rnn_seq1(x, w_ih, w_hh, bias, w_deconv,
                          mxu_bf16=mxu_bf16, tile_cap=tile_cap)


@functools.partial(jax.jit, static_argnames=("mxu_bf16", "tile_cap"))
def _grid_rnn_seq1(x: Array, w_ih: Array, w_hh: Array, bias: Array,
                   w_deconv: Array, mxu_bf16: bool = False,
                   tile_cap: int = 88) -> Array:
    """Fused unfold(k=4) -> BiLSTM -> deconv(k=4) -> overlap-add on a 4D
    canvas with the sequence on AXIS 1.

    Args:
      x: [B, S, P, C] canvas (already LayerNorm'd); sequence along axis 1,
        the other spatial axis P is batch-like. C must be a multiple of 8.
      w_ih: [2, 4*C, 4H] (tap-major rows, dir 0 = forward); w_hh: [2, H, 4H];
      bias: [2, 4H] (gate order i,f,g,o); w_deconv: [2H, 4*C] tap-major.

    Returns:
      [B, S, P, C] folded output (no deconv bias, no residual — the caller
      adds both in one fused elementwise pass); exact on sequence rows
      [3, L-1] (L = S-3), pad-contaminated outside (GridNetBlock crops).
    """
    b, s_true, p_true, cdim = x.shape
    hidden = w_hh.shape[1]
    io_dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    L = s_true - (_KS - 1)
    assert L >= 1, "sequence too short for k=4 unfold"
    assert cdim % 8 == 0, "channel dim must be a multiple of 8"

    hp = _round_up(hidden, LANE)
    kc = _KS * cdim
    w_comb, bias_p, wd = _prep_weights(
        w_ih, w_hh, bias, w_deconv, hidden, hp)

    # tile_cap (static; from the FDBM_TPU_GRIDRNN_TILE env knob via the
    # public wrapper) caps the waste-minimising tile choice — applies only
    # to this canvas kernel; grid_bilstm_fold keeps a fixed 64. 88 fits
    # VMEM at C=32/H<=128 (bf16 io) and leaves <1% pad waste on the
    # 262/263-row production canvases. In fp32 io the seq-resident output
    # block and the hbuf scratch double in bytes, so cap the tile at 64.
    if io_dt == jnp.float32:
        tile_cap = min(tile_cap, 64)
    tile = _pick_tile(p_true, tile_cap)
    n_tiles = -(-p_true // tile)
    n_real = -(-L // _CHUNK)
    nb = -(-s_true // _CHUNK)  # seq blocks present in the canvas

    grid = (b, n_tiles, n_real + 1)

    # Clamped index maps: the `nxt` stream at the last block would address
    # one block past the canvas — clamp to the last block. Exact for the
    # crop: positions whose window genuinely needs the missing block lie
    # beyond row L-1 whenever the canvas holds only nb <= n_real blocks.
    def cur_f(bi, ti, sj):
        return (bi, jnp.minimum(sj, nb - 1), ti, 0)

    def nxt_f(bi, ti, sj):
        return (bi, jnp.minimum(sj + 1, nb - 1), ti, 0)

    def cur_b(bi, ti, sj):
        return (bi, jnp.clip(n_real - 1 - sj, 0, nb - 1), ti, 0)

    def nxt_b(bi, ti, sj):
        return (bi, jnp.clip(n_real - sj, 0, nb - 1), ti, 0)

    blk = (1, _CHUNK, tile, cdim)
    bcast = lambda bi, ti, sj: (0, 0, 0)
    xio = x.astype(io_dt)
    n_out = -(-s_true // _CHUNK)  # real output seq blocks
    # bf16 io runs all matmuls on bf16 operands anyway — ship the weights
    # pre-cast so their VMEM buffers halve and the in-kernel casts vanish.
    w_dt = jnp.bfloat16 if (mxu_bf16 or io_dt == jnp.bfloat16) \
        else jnp.float32

    outf, outb = pl.pallas_call(
        functools.partial(
            _canvas_kernel, hidden=hp, cdim=cdim, L=L, n_real=n_real,
            n_out=n_out, s_true=s_true, mxu_bf16=mxu_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, cur_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, nxt_f, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, nxt_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kc + hp, 4 * hp), bcast,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 4 * hp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, kc), bcast, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk,
                         lambda bi, ti, sj: (bi, jnp.minimum(sj, n_out - 1),
                                             ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk,
                         lambda bi, ti, sj: (bi, jnp.clip(n_real - sj, 0,
                                                          n_out - 1), ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_true, p_true, cdim), io_dt),
        ] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * tile, hp), jnp.float32),
            pltpu.VMEM((2 * tile, hp), jnp.float32),
            pltpu.VMEM((_KS - 1, tile, cdim), jnp.float32),
            pltpu.VMEM((_CHUNK, tile, cdim), jnp.float32),
            # hidden-state buffers feed only the deconv matmul; in bf16 io
            # the matmul runs on bf16 operands anyway, so storing them
            # bf16 halves their VMEM
            pltpu.VMEM((_CHUNK, tile, hp), io_dt),
            pltpu.VMEM((_CHUNK, tile, hp), io_dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(xio, xio, xio, xio,
      w_comb.astype(w_dt),
      bias_p.astype(jnp.float32), wd.astype(w_dt))

    return outf, outb
