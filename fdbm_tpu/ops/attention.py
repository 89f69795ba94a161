"""Fused full-band frame self-attention Pallas kernel for TF-GridNet.

The reference computes per-head attention over frames with explicit
[B,H,T,E*Q] flattens, a T x T softmax, and a second einsum (reference
fdbm/backbones/tfgridnet.py:394-418). In XLA on TPU that costs, per
block: staging copies around the two einsums, plus THREE full HBM round
trips of the [B,H,T,T] fp32 score tensor (write scores, read+write
softmax, read for the value matmul) — profiled at several ms/forward of
pure memory glue (BENCH_NOTES round-3).

This kernel runs the attention for one (batch, q-tile) grid cell in
VMEM: scores, softmax and the value contraction never touch HBM. The
head loop is algebraic, not a data layout: with Q/K/V kept in the
model's own [B, T, Q*(H*Eh)] flat layout (head-minor lanes), head h's
score matrix is

    S_h = (Q . mask_h) @ K^T     (contraction over ALL q*(h,e) lanes)

because the lane mask zeroes every other head's columns — no per-head
gather, no 5-D transposes. The value side reuses the same trick in
reverse: O = sum_h softmax(S_h) @ V masked to head h's output lanes.
The h-fold FLOP redundancy (H=4 full-width dots instead of 1) is ~1.3 ms
of MXU time at the production shape — far below the memory glue it
replaces; the MXU is idle in this program anyway (VPU/HBM-bound,
BENCH_NOTES roofline).

VMEM sizing (round-3 fix): K and one V lane-block stay fully resident
(the value contraction needs every key/value frame), but the QUERY side
is tiled — grid (b, n_qt, n_vb), with the per-tile fp32 score scratch
[H, tq, T] recomputed when the v-block index wraps to 0. The tile tq is
chosen at trace time by `_vmem_estimate` (ladder: full T, 256, 128, 64);
`fast_path_ok` exposes the same estimate to the model's dispatch gate so
the gate and the kernel can never disagree about what fits. The previous
full-T kernel compiled at the 4 s bucket (T=262) but blew the 16 MB
scoped-VMEM stack by 1.1 MB at the 8 s folder-serving bucket (T=321,
measured: 17.14 MB requested).

Numerics: scores and softmax are fp32 regardless of io dtype (matches
the XLA path, which casts the score tensor to fp32 for softmax —
models/tfgridnet.py GridNetBlock). Used on the inference fast path only
(same gating as ops/gridrnn.grid_rnn_seq1); training runs the XLA
attention, which autodiffs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdbm_tpu.ops.lstm import _use_interpret

Array = jnp.ndarray

# Default V/O lanes per grid step. 2048 lanes x 256 frames is 1 MB bf16 /
# 2 MB fp32 per stream. Long sequences step down the ladder below to trade
# more vb grid steps for smaller resident V/O blocks.
_V_BLK = 2048
_V_BLK_LADDER = (2048, 1024, 512)

# Scoped-VMEM budget the tile chooser sizes against — a threshold on the
# ESTIMATE, anchored on five compiler-measured points (round-3 folder
# sweep + probes, round-4 120-file sweep, on the v5e). With the v_stage
# term (added after the round-4 sweep OOM; see _vmem_estimate):
#   T=262 full-T  v2048  compiled+ran   -> estimate 15.4 MiB (must accept)
#   T=321 tq=128  v2048  compiled+ran   -> estimate 13.0 MiB (must accept)
#   T=328 full-T  v2048  OOM, 17.14 MiB -> estimate 20.3 MiB (must reject)
#   T=513 tq=128  v2048  OOM, 16.76 MiB -> estimate 19.0 MiB (must reject)
#   T=577 tq=64   v2048  OOM, 16.28 MiB -> estimate 16.9 MiB (must reject)
# 16 MiB separates every accept (<=15.4) from every reject (>=16.9).
_VMEM_BUDGET = 16 * 2**20


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _vmem_estimate(tq: int, t_len: int, qk_lanes: int, n_head: int,
                   io_bytes: int, v_blk: int = _V_BLK) -> int:
    """Scoped-VMEM bytes for one grid cell at query-tile size ``tq``.

    Counts the Mosaic-allocated window buffers (Q tile, K full, V/O
    lane-blocks — V and O double-buffered because their index advances
    with the fastest grid dim; Q double-buffered only when it advances,
    i.e. when tiled), the fp32 score scratch [H, tq, T], the kernel-body
    fp32 temporaries (two [tq, v_blk] value-side arrays and one [tq, T]
    score row-block), an fp32 [lanes, T] staging copy of K for the
    lane-contraction score dot (the MXU contracts the RHS over sublanes,
    so Mosaic re-lays K out transposed; without this term the estimate
    ran 4.3 MiB below the compiler's measured 16.76 MiB at T=513), and
    an io-dtype staging copy of the V block for the value dot (same RHS
    sublane-contraction staging; without it the estimate ran 1.6 MiB
    below the compiler's measured 16.28 MiB at the round-4 sweep's
    T=577 tq=64 OOM).
    """
    t_p, tq_p = _pad8(t_len), _pad8(tq)
    ql = _pad128(qk_lanes)
    sl = _pad128(t_len)
    q_blk = tq_p * ql * io_bytes * (2 if tq < t_len else 1)
    k_b = t_p * ql * io_bytes
    v_b = 2 * t_p * v_blk * io_bytes
    o_blk = 2 * tq_p * v_blk * io_bytes
    scr = n_head * tq_p * sl * 4
    tmp = 2 * tq_p * v_blk * 4 + tq_p * sl * 4
    k_stage = t_p * ql * 4
    v_stage = t_p * v_blk * io_bytes
    total = q_blk + k_b + v_b + o_blk + scr + tmp + k_stage + v_stage
    if io_bytes == 4:
        # fp32 headroom (r5 anchor): every term above was calibrated on
        # the five bf16 compiler anchors, where the fp32 staging copies
        # coincide with the io-dtype buffers.  At io fp32 Mosaic keeps
        # additional full-precision temporaries the bf16 model cannot
        # see: the compiler measured 26.59 MiB for T=321 / tq=128 /
        # v1024 / fp32 (in-training eval, b=2) against a 15.1 MiB
        # estimate — a 1.76x deficit that OOMed the scoped-VMEM stack.
        # Scale by the measured ratio + margin; fp32 shapes that no
        # longer fit fall back to the XLA attention path (eval-only —
        # production serving is bf16 and keeps its validated configs).
        total = int(total * 1.8)
    return total


def _pick_q_tile(t_len: int, qk_lanes: int, n_head: int,
                 io_bytes: int, hd: int = 32):
    """Largest (query tile, V lane-block) pair from the ladder that fits
    the VMEM budget, or None when even the smallest doesn't (caller falls
    back to XLA). V-block candidates must hold whole (h, d) output groups
    (the kernel's head-select masks rely on it)."""
    # V-block OUTER: exhaust the query-tile ladder at the default V block
    # first so shapes that fit it keep their compiler-validated configs;
    # smaller V blocks (more vb grid steps) are a long-sequence fallback.
    for vb in _V_BLK_LADDER:
        if hd and vb % hd:
            continue
        for tq in (t_len, 256, 128, 64):
            if tq > t_len:
                continue
            if _vmem_estimate(tq, t_len, qk_lanes, n_head, io_bytes,
                              vb) <= _VMEM_BUDGET:
                return tq, vb
    return None


def fast_path_ok(c: int, t_len: int, q_bins: int, e: int,
                 n_head: int, io_bytes: int = 2,
                 fused_norms: bool = False) -> bool:
    """True when the fused kernel can run this shape within VMEM.

    The model's dispatch gate (models/tfgridnet._attn_fast_path_ok)
    delegates here so gating and kernel sizing share one estimator.
    ``2048 % c == 0`` keeps whole (h, d) output groups inside one V/O
    lane block (the kernel's head-select masks rely on it). Fused norms
    (PReLU + per-head E-norm applied by the flat-layout norm kernel on
    the way in — see flat_group_norm) additionally require power-of-two
    group widths for the group-stats butterfly; they run in a separate
    pallas_call, so the attention kernel's VMEM sizing is unchanged.
    """
    d = c // n_head
    if fused_norms and not (
            e > 0 and d > 0 and e & (e - 1) == 0 and d & (d - 1) == 0):
        return False
    return (c > 0 and
            _pick_q_tile(t_len, q_bins * n_head * e, n_head, io_bytes,
                         hd=c) is not None)


def _norm_kernel(x_ref, nrm_ref, o_ref, *, width: int):
    o_ref[0] = _prelu_norm(x_ref[0], nrm_ref, width).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("width",))
def flat_group_norm(x: Array, alpha: Array, gamma: Array, beta: Array,
                    width: int) -> Array:
    """PReLU + per-group affine norm on a FLAT [B, T, L] feature map.

    Semantics match _AllHeadPReLULayerNorm applied to the [B, T, Q, H*w]
    view of ``x`` (stats over each head's ``w`` lanes, fp32, biased
    variance, eps 1e-5): L = Q*H*w, groups are aligned lane runs of
    ``width`` (power of two), and alpha/gamma/beta are the module's
    [H,1] / [H,w] / [H,w] parameters, tiled here to per-lane vectors.

    Why a kernel: the [B, T, Q, 8] layout XLA materialises for the Q/K
    feature maps is 16x lane-padded (minor dim 8 -> 128 lanes) and the V
    map 4x, so any XLA-side norm pays padded bandwidth on every pass —
    device-profiled at ~640 ms of the 4.8 s 30-step enhance program. The
    flat layout is <6% padded and the whole norm is one read+write.
    """
    b, t_len, lanes = x.shape
    assert width & (width - 1) == 0, "group width must be a power of two"
    assert lanes % width == 0
    io_dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    n_grp = lanes // width
    per = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32).reshape(-1, 1),
                           (jnp.asarray(alpha).size, width)).reshape(-1)
    a_l = jnp.tile(per, n_grp * width // per.size)[:lanes]
    g_l = jnp.tile(jnp.asarray(gamma, jnp.float32).reshape(-1),
                   lanes // jnp.asarray(gamma).size)
    b_l = jnp.tile(jnp.asarray(beta, jnp.float32).reshape(-1),
                   lanes // jnp.asarray(beta).size)
    nrm = jnp.stack([a_l, g_l, b_l])

    # Row tile: size against ~5 live [tile_t, lanes] fp32 butterfly
    # temporaries within a ~10 MB scoped-VMEM budget — the fixed tile 32
    # was grid-overhead-bound (128 grid cells for the production V map;
    # device-profiled 0.47 ms/call vs a ~0.17 ms bandwidth floor).
    budget = 10 * 2**20
    tile_t = max(8, min(_pad8(t_len), budget // (5 * lanes * 4) // 8 * 8))
    n_t = -(-t_len // tile_t)

    out = pl.pallas_call(
        functools.partial(_norm_kernel, width=width),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, tile_t, lanes), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lanes), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, lanes), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_len, lanes), io_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_use_interpret(),
    )(x.astype(io_dt), nrm)
    return out


def _group_mean(x: Array, width: int) -> Array:
    """Per-aligned-lane-group mean over groups of ``width`` lanes (power
    of two) via an XOR-butterfly of lane rolls: after stage k every lane
    holds the sum over its 2k-aligned group, so log2(width) stages leave
    every lane with its full group sum — no cross-lane layout change,
    pure VPU work."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    ax = x.ndim - 1
    roll = pltpu.roll  # native cyclic lane rotate (one VPU op per stage)
    s = x
    k = 1
    while k < width:
        take_left = lanes % (2 * k) < k  # partner is lane + k
        s = s + jnp.where(take_left, roll(s, -k % s.shape[ax], ax),
                          roll(s, k, ax))
        k *= 2
    return s * (1.0 / width)


def _prelu_norm(x: Array, nrm_ref, width: int, eps: float = 1e-5) -> Array:
    """PReLU + per-head affine E-norm on a flat [rows, lanes] block, fp32.

    ``nrm_ref`` rows: 0 = per-lane PReLU alpha, 1 = gamma, 2 = beta
    (period H*E over the lane axis, pre-tiled by the caller). Matches
    _AllHeadPReLULayerNorm exactly: biased TWO-PASS variance over each
    head's E lanes (E[x^2]-mu^2 loses ~1e-4 relative to fp32
    cancellation when a width-2 group is nearly equal), fp32 statistics,
    eps inside the rsqrt.
    """
    a = nrm_ref[0][None, :]
    g = nrm_ref[1][None, :]
    b = nrm_ref[2][None, :]
    x = x.astype(jnp.float32)
    x = jnp.where(x >= 0, x, a * x)
    mu = _group_mean(x, width)
    xc = x - mu
    var = _group_mean(xc * xc, width)
    return xc * jax.lax.rsqrt(var + eps) * g + b


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, s_scr, *, n_head: int,
                 e_dim: int, d_dim: int, q_bins: int, t_len: int,
                 tq: int, scale: float, mm_dt):
    qi = pl.program_id(1)
    vb = pl.program_id(2)
    hi = jax.lax.Precision.HIGHEST if mm_dt == jnp.float32 else None

    @pl.when(vb == 0)
    def _():
        q = q_ref[0].astype(mm_dt)  # [tq, Q*H*E] (+ lane pad)
        k = k_ref[0].astype(mm_dt)  # [T,  Q*H*E]
        he = n_head * e_dim
        lanes = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        real = lanes < q_bins * he
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, t_len), 1)
        for h in range(n_head):
            sel = jnp.logical_and(real, (lanes % he) // e_dim == h)
            qm = jnp.where(sel, q, jnp.zeros_like(q))
            # contraction over the full lane dim: masked lanes (other
            # heads, VMEM pad) contribute exact zeros
            s = jax.lax.dot_general(
                qm, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            s = s * scale
            # mask pad score columns (key frames beyond t_len)
            s = jnp.where(cols < t_len, s, -jnp.inf)
            s = jax.nn.softmax(s, axis=-1)
            s_scr[h] = s
        # rows of a partial final q-tile (query index >= t_len) hold
        # garbage; they stay row-local through softmax and the value
        # matmul and are dropped by the masked output store.

    v = v_ref[0].astype(mm_dt)  # [T, v_blk lanes of Q*(H*D)]
    hd = n_head * d_dim
    # absolute lane id mod H*D is block-invariant (_V_BLK % (H*D) == 0)
    vlanes = jax.lax.broadcasted_iota(jnp.int32, (tq, v.shape[-1]), 1)
    acc = jnp.zeros((tq, v.shape[-1]), jnp.float32)
    for h in range(n_head):
        o_h = jax.lax.dot_general(
            s_scr[h].astype(mm_dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        acc = jnp.where((vlanes % hd) // d_dim == h, o_h, acc)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "e_dim"))
def frame_attention(q: Array, k: Array, v: Array, n_head: int,
                    e_dim: int, norms=None) -> Array:
    """Fused multi-head frame attention on flat head-minor layouts.

    Args:
      q, k: [B, T, Q, H*E] query/key features.
      v: [B, T, Q, H*D] value features (D = C // H).
      n_head: H; e_dim: E. Scale is 1/sqrt(E*Q) (reference
        tfgridnet.py:407).
      norms: optional ((a,g,b), (a,g,b), (a,g,b)) PReLU-alpha / gamma /
        beta for q, k, v — each with H*E (H*D for v) per-channel values.
        When given, q/k/v are RAW projector outputs and PReLU + per-head
        E-norm (_AllHeadPReLULayerNorm semantics) run on the FLAT
        layouts via flat_group_norm before the attention kernel. This
        removes the norm passes over feature maps whose minor dim (8 for
        q/k at the production config) is 16x lane-padded —
        device-profiled at ~640 ms of the 4.8 s 30-step enhance program.

    Returns:
      [B, T, Q, H*D]: per-head softmax(QK^T/sqrt(E*Q)) @ V with the
      reference's [h-slow, d-fast] channel merge — bit-layout identical
      to the XLA einsum path's output.
    """
    b, t_len, q_bins, he = q.shape
    assert he == n_head * e_dim
    hd = v.shape[-1]
    d_dim = hd // n_head
    io_dt = v.dtype if v.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    mm_dt = jnp.bfloat16 if io_dt == jnp.bfloat16 else jnp.float32
    io_bytes = 2 if io_dt == jnp.bfloat16 else 4
    scale = 1.0 / math.sqrt(e_dim * q_bins)

    picked = _pick_q_tile(t_len, q_bins * he, n_head, io_bytes, hd=hd)
    assert picked is not None, (
        f"frame_attention dispatched on a VMEM-unsafe shape "
        f"(T={t_len}, lanes={q_bins * he}); the model gate "
        f"(_attn_fast_path_ok) should have routed this to XLA")
    tq, v_blk = picked
    assert v_blk % hd == 0, "V block must hold whole (h,d) groups"
    n_qt = -(-t_len // tq)

    qf = q.reshape(b, t_len, q_bins * he).astype(io_dt)
    kf = k.reshape(b, t_len, q_bins * he).astype(io_dt)
    vf = v.reshape(b, t_len, q_bins * hd).astype(io_dt)
    if norms is not None:
        qf = flat_group_norm(qf, *norms[0], width=e_dim)
        kf = flat_group_norm(kf, *norms[1], width=e_dim)
        vf = flat_group_norm(vf, *norms[2], width=d_dim)
    n_vb = -(-(q_bins * hd) // v_blk)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, n_head=n_head, e_dim=e_dim, d_dim=d_dim,
            q_bins=q_bins, t_len=t_len, tq=tq, scale=scale, mm_dt=mm_dt),
        grid=(b, n_qt, n_vb),
        in_specs=[
            pl.BlockSpec((1, tq, q_bins * he), lambda bi, qi, vb: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_len, q_bins * he),
                         lambda bi, qi, vb: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_len, v_blk), lambda bi, qi, vb: (bi, 0, vb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, v_blk),
                               lambda bi, qi, vb: (bi, qi, vb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_len, q_bins * hd), io_dt),
        scratch_shapes=[
            pltpu.VMEM((n_head, tq, t_len), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(qf, kf, vf)

    return out.reshape(b, t_len, q_bins, hd)
