"""Experiment: LayerNorm-over-C=32 variants on the TF-GridNet canvas shape.

The profile shows convert_reduce_fusion (LN statistics) at 12.7 ms/forward
(43 GB/s — XLA's minor-dim-32 reduce codegen). Candidates:

  a) baseline  — jnp.mean/jnp.var in fp32 (current layer_norm_f32)
  b) jmatrix   — stats via dots against J/C (ones matrix): the dot both
                 reduces over C and broadcasts the stat back to all C lanes,
                 so the whole LN is 2 MXU dots + one elementwise pass
  c) jmatrix1  — single dot: stack [x | x*x] along C and hit it with a
                 [2C, 2C] block matrix producing [mu_b | m2_b]

Usage: python tools/exp_ln.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdbm_tpu.ops.lstm import _round_up, _use_interpret

from fdbm_tpu.utils.compilation_cache import setup_compilation_cache
from tools.timing import chain_time

setup_compilation_cache()

B, S, P, C = 16, 262, 263, 32
EPS = 1e-5


def ln_baseline(x, gamma, beta):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xh = (x32 - mu) * jax.lax.rsqrt(var + EPS)
    return (xh * gamma + beta).astype(x.dtype)


def ln_jmatrix(x, gamma, beta):
    x32 = x.astype(jnp.float32)
    j = jnp.full((C, C), 1.0 / C, jnp.float32)
    mu_b = x32 @ j                       # [.., C] mean broadcast to lanes
    m2_b = (x32 * x32) @ j               # [.., C] E[x^2] broadcast
    var = m2_b - mu_b * mu_b
    xh = (x32 - mu_b) * jax.lax.rsqrt(var + EPS)
    return (xh * gamma + beta).astype(x.dtype)


def ln_jmatrix1(x, gamma, beta):
    x32 = x.astype(jnp.float32)
    xx = jnp.concatenate([x32, x32 * x32], axis=-1)  # [.., 2C]
    jblk = np.zeros((2 * C, 2 * C), np.float32)
    jblk[:C, :C] = 1.0 / C
    jblk[C:, C:] = 1.0 / C
    stats = xx @ jnp.asarray(jblk)
    mu_b, m2_b = stats[..., :C], stats[..., C:]
    var = m2_b - mu_b * mu_b
    xh = (x32 - mu_b) * jax.lax.rsqrt(var + EPS)
    return (xh * gamma + beta).astype(x.dtype)


Array = jnp.ndarray

# Rows per grid step. [8192, 32] fp32 lane-pads to 4 MB in VMEM; with the
# in/out blocks plus the fp32 compute copies this stays well inside the
# ~16 MB scoped-VMEM budget at C <= 64.
_ROWS = 8192


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, cdim: int, eps: float,
               stats: str):
    x = x_ref[0].astype(jnp.float32)  # [s_blk, p_blk, C]
    if stats == "dot":
        # fp32 MXU passes must be exact (HIGHEST): the default precision
        # runs bf16 passes and costs ~5e-3 relative error on the stats.
        # dot_general on the 3-D block directly — an in-kernel reshape to
        # [sb*pb, C] materializes relayout copies that blow the VMEM stack.
        j = jnp.full((cdim, cdim), 1.0 / cdim, jnp.float32)
        dn = (((2,), (0,)), ((), ()))
        mu = jax.lax.dot_general(x, j, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        xc = x - mu
        var = jax.lax.dot_general(xc * xc, j, dn,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        out = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + b_ref[0]
        o_ref[0] = out.astype(o_ref.dtype)
        return
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + b_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "rows_blk", "stats"))
def layer_norm_lastdim(x: Array, gamma: Array, beta: Array,
                       eps: float = 1e-5, rows_blk: int = _ROWS,
                       stats: str = "dot") -> Array:
    """LayerNorm over the trailing dim of ``x`` (fp32 statistics).

    Equivalent to layers.layer_norm_f32(x, gamma, beta, axis=-1); one HBM
    pass instead of three. C must be a multiple of 8 and <= 128 (MXU
    stats matrix is [C, C]; the canvas uses C=32).
    """
    cdim = x.shape[-1]
    assert cdim % 8 == 0 and cdim <= 128, "C must be multiple of 8, <= 128"
    io_dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d

    # Keep the model's own 4-D canvas layout and block it exactly like the
    # grid-RNN kernel does ([1, s_blk, p_blk, C] blocks): 2-D [rows, C]
    # blocking measured 15 GB/s on this toolchain's DMA (tools/exp_ln.py)
    # while the 4-D canvas blocks stream near full rate. A non-4D input is
    # viewed as [lead..., C] with up to two leading dims folded.
    xr = x.astype(io_dt)
    if xr.ndim != 4:
        xr = xr.reshape(1, 1, rows, cdim) if xr.ndim <= 2 else \
            xr.reshape(1, -1, x.shape[-2], cdim)
    b, s, p, _ = xr.shape
    p_blk = min(_round_up(p, 8), 128)
    s_blk = min(_round_up(s, 8), max(8, rows_blk // p_blk))

    grid = (b, -(-s // s_blk), -(-p // p_blk))
    blk = (1, s_blk, p_blk, cdim)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, cdim=cdim, eps=eps, stats=stats),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, lambda bi, si, pi: (bi, si, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cdim), lambda bi, si, pi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cdim), lambda bi, si, pi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda bi, si, pi: (bi, si, pi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, p, cdim), io_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_use_interpret(),
    )(xr, gamma.astype(jnp.float32)[None, :], beta.astype(jnp.float32)[None, :])

    return out.reshape(*lead, cdim)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, P, C)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    ref = np.asarray(ln_baseline(x, gamma, beta), np.float32)
    variants = [("baseline", ln_baseline)]
    for rb in (512, 1024, 2048):
        for st in ("dot", "vpu"):
            variants.append((
                f"pallas_{st}_{rb}",
                lambda x, g, b, rb=rb, st=st: layer_norm_lastdim(
                    x, g, b, eps=EPS, rows_blk=rb, stats=st)))

    for name, fn in variants:
        g = jax.jit(lambda h, fn=fn: fn(h, gamma, beta))
        out = np.asarray(g(x), np.float32)
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        sec = chain_time(g, x, k_short=4, k_long=24, reps=3)
        print(f"{name:10s}  {sec*1e3:8.3f} ms/call   rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
