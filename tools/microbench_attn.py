"""Stage-level microbench of the GridNetBlock attention section (TPU).

Splits the post-RNN attention tail at the bench.py canvas shape into:
  qkv    — the three 1x1 Dense projections + per-head PReLU/LayerNorm
  kernel — the fused frame-attention Pallas kernel (ops/attention.py)
  xla    — the XLA einsum attention it replaces (score/softmax/value)
  tail   — output Dense + PReLU + LayerNorm + residual add

Usage: python tools/microbench_attn.py [fp32|bf16]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.timing import chain_time  # noqa: E402

from flax import linen as nn  # noqa: E402

from fdbm_tpu.models.layers import PReLU, layer_norm_f32  # noqa: E402
from fdbm_tpu.models.tfgridnet import _AllHeadPReLULayerNorm  # noqa: E402
from fdbm_tpu.ops.attention import frame_attention  # noqa: E402
from fdbm_tpu.utils.compilation_cache import setup_compilation_cache  # noqa: E402


class _QKV(nn.Module):
    n_head: int = 4
    e: int = 2
    c: int = 32
    lane_stats: bool = False

    @nn.compact
    def __call__(self, x):
        h, e, c = self.n_head, self.e, self.c
        d = c // h
        ls = self.lane_stats
        q = nn.Dense(h * e, dtype=x.dtype, name="Q")(x)
        q = _AllHeadPReLULayerNorm(h, e, lane_stats=ls, name="nQ")(q)
        k = nn.Dense(h * e, dtype=x.dtype, name="K")(x)
        k = _AllHeadPReLULayerNorm(h, e, lane_stats=ls, name="nK")(k)
        v = nn.Dense(c, dtype=x.dtype, name="V")(x)
        v = _AllHeadPReLULayerNorm(h, d, lane_stats=ls, name="nV")(v)
        return q, k, v


class _Tail(nn.Module):
    c: int = 32

    @nn.compact
    def __call__(self, o, res):
        o = nn.Dense(self.c, dtype=o.dtype, name="proj")(o)
        o = PReLU(param_shape=(), name="prelu")(o)
        g = self.param("g", nn.initializers.ones, (self.c,))
        bta = self.param("b", nn.initializers.zeros, (self.c,))
        return layer_norm_f32(o, g, bta, axis=-1) + res


def main():
    setup_compilation_cache()
    dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] != "fp32") else jnp.float32
    b, t, q, c, h, e = 16, 256, 257, 32, 4, 2
    d = c // h
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, q, c)), dt)

    qkv = _QKV()
    pq = qkv.init(jax.random.PRNGKey(0), x)
    f_qkv = jax.jit(lambda a: qkv.apply(pq, a))
    print(f"qkv+norms : {chain_time(f_qkv, x)*1e3:7.2f} ms", flush=True)

    qkv_l = _QKV(lane_stats=True)
    f_qkv_l = jax.jit(lambda a: qkv_l.apply(pq, a))
    print(f"qkv lane  : {chain_time(f_qkv_l, x)*1e3:7.2f} ms", flush=True)

    qf = jnp.asarray(rng.standard_normal((b, t, q, h * e)), dt)
    kf = jnp.asarray(rng.standard_normal((b, t, q, h * e)), dt)
    vf = jnp.asarray(rng.standard_normal((b, t, q, c)), dt)
    f_ker = jax.jit(lambda a: frame_attention(a, kf, vf, h, e))
    print(f"pallas ker: {chain_time(f_ker, qf)*1e3:7.2f} ms", flush=True)

    def xla_attn(qa):
        q5 = qa.reshape(b, t, q, h, e)
        k5 = kf.reshape(b, t, q, h, e)
        v5 = vf.reshape(b, t, q, h, d)
        scale = 1.0 / np.sqrt(e * q)
        attn = jnp.einsum("btqhe,buqhe->bhtu", q5, k5) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v5.dtype)
        out = jnp.einsum("bhtu,buqhd->btqhd", attn, v5)
        return out.reshape(b, t, q, c)

    f_xla = jax.jit(xla_attn)
    print(f"xla attn  : {chain_time(f_xla, qf)*1e3:7.2f} ms", flush=True)

    tail = _Tail()
    pt = tail.init(jax.random.PRNGKey(1), vf, x)
    f_tail = jax.jit(lambda a: tail.apply(pt, a, x))
    print(f"proj tail : {chain_time(f_tail, vf)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
