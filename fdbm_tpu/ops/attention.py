"""Fused full-band frame self-attention Pallas kernel for TF-GridNet.

The reference computes per-head attention over frames with explicit
[B,H,T,E*Q] flattens, a T x T softmax, and a second einsum (reference
fdbm/backbones/tfgridnet.py:394-418). In XLA on TPU that costs, per
block: staging copies around the two einsums, plus THREE full HBM round
trips of the [B,H,T,T] fp32 score tensor (write scores, read+write
softmax, read for the value matmul) — profiled at several ms/forward of
pure memory glue (BENCH_NOTES round-3).

This kernel runs the whole attention for one (batch, q-tile) grid cell in
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

# V/O lanes per grid step. 2048 lanes x 256 frames is 1 MB bf16 / 2 MB
# fp32 per stream; with Q/K resident and the fp32 score scratch the
# kernel sits well inside the 16 MB scoped-VMEM budget.
_V_BLK = 2048


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, s_scr, *, n_head: int,
                 e_dim: int, d_dim: int, q_bins: int, t_len: int,
                 scale: float, mm_dt):
    qt = pl.program_id(1)
    hi = jax.lax.Precision.HIGHEST if mm_dt == jnp.float32 else None

    @pl.when(qt == 0)
    def _():
        q = q_ref[0].astype(mm_dt)  # [T, Q*H*E] (+ lane pad)
        k = k_ref[0].astype(mm_dt)
        he = n_head * e_dim
        lanes = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        real = lanes < q_bins * he
        rows = jax.lax.broadcasted_iota(jnp.int32, (t_len, t_len), 1)
        for h in range(n_head):
            sel = jnp.logical_and(real, (lanes % he) // e_dim == h)
            qm = jnp.where(sel, q, jnp.zeros_like(q))
            # contraction over the full lane dim: masked lanes (other
            # heads, VMEM pad) contribute exact zeros
            s = jax.lax.dot_general(
                qm, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            s = s * scale
            # mask sublane-pad score columns (T not a multiple of 8)
            s = jnp.where(rows < t_len, s, -jnp.inf)
            s = jax.nn.softmax(s, axis=-1)
            s_scr[h] = s

    v = v_ref[0].astype(mm_dt)  # [T, v_blk lanes of Q*(H*D)]
    hd = n_head * d_dim
    # absolute lane id mod H*D is block-invariant (_V_BLK % (H*D) == 0)
    vlanes = jax.lax.broadcasted_iota(jnp.int32, (t_len, v.shape[-1]), 1)
    acc = jnp.zeros((t_len, v.shape[-1]), jnp.float32)
    for h in range(n_head):
        o_h = jax.lax.dot_general(
            s_scr[h].astype(mm_dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        acc = jnp.where((vlanes % hd) // d_dim == h, o_h, acc)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "e_dim"))
def frame_attention(q: Array, k: Array, v: Array, n_head: int,
                    e_dim: int) -> Array:
    """Fused multi-head frame attention on flat head-minor layouts.

    Args:
      q, k: [B, T, Q, H*E] query/key features (already PReLU+normed).
      v: [B, T, Q, H*D] value features (D = C // H).
      n_head: H; e_dim: E. Scale is 1/sqrt(E*Q) (reference
        tfgridnet.py:407).

    Returns:
      [B, T, Q, H*D]: per-head softmax(QK^T/sqrt(E*Q)) @ V with the
      reference's [h-slow, d-fast] channel merge — bit-layout identical
      to the XLA einsum path's output.
    """
    b, t_len, q_bins, he = q.shape
    assert he == n_head * e_dim
    hd = v.shape[-1]
    d_dim = hd // n_head
    assert _V_BLK % hd == 0, "V block must hold whole (h,d) groups"
    io_dt = v.dtype if v.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    mm_dt = jnp.bfloat16 if io_dt == jnp.bfloat16 else jnp.float32
    scale = 1.0 / math.sqrt(e_dim * q_bins)

    qf = q.reshape(b, t_len, q_bins * he).astype(io_dt)
    kf = k.reshape(b, t_len, q_bins * he).astype(io_dt)
    vf = v.reshape(b, t_len, q_bins * hd).astype(io_dt)
    n_vb = -(-(q_bins * hd) // _V_BLK)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, n_head=n_head, e_dim=e_dim, d_dim=d_dim,
            q_bins=q_bins, t_len=t_len, scale=scale, mm_dt=mm_dt),
        grid=(b, n_vb),
        in_specs=[
            pl.BlockSpec((1, t_len, q_bins * he), lambda bi, qt: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_len, q_bins * he), lambda bi, qt: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_len, _V_BLK), lambda bi, qt: (bi, 0, qt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_len, _V_BLK),
                               lambda bi, qt: (bi, 0, qt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_len, q_bins * hd), io_dt),
        scratch_shapes=[
            pltpu.VMEM((n_head, t_len, t_len), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(qf, kf, vf)

    return out.reshape(b, t_len, q_bins, hd)
