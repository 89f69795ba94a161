"""Per-component microbench of the TF-GridNet hot path (chained timing).

Measures one intra RnnPath, one inter RnnPath, and one full GridNetBlock at
the bench.py shapes, bf16, Pallas inference path. Usage:

    python tools/microbench_block.py [fp32|bf16]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.timing import chain_time  # noqa: E402

from fdbm_tpu.models.tfgridnet import GridNetBlock, _RnnPath  # noqa: E402
from fdbm_tpu.utils.compilation_cache import setup_compilation_cache  # noqa: E402


def main():
    setup_compilation_cache()
    dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] != "fp32") else jnp.float32
    on_tpu = jax.default_backend() == "tpu"
    b, t, q, c = 16, 256, 257, 32
    olp = 3
    rng = np.random.default_rng(0)
    xp = jnp.asarray(
        rng.standard_normal((b, t + 2 * olp, q + 2 * olp, c)), dt)
    x = jnp.asarray(rng.standard_normal((b, t, q, c)), dt)

    intra = _RnnPath(c, 100, dt, use_pallas=on_tpu)
    pi = intra.init(jax.random.PRNGKey(0), xp, 2)
    f_intra = jax.jit(lambda a: intra.apply(pi, a, 2))
    t_i = chain_time(f_intra, xp)
    print(f"intra RnnPath: {t_i*1e3:7.1f} ms")

    f_inter = jax.jit(lambda a: intra.apply(pi, a, 1))
    t_n = chain_time(f_inter, xp)
    print(f"inter RnnPath: {t_n*1e3:7.1f} ms")

    blk = GridNetBlock(emb_dim=c, hidden=100, dtype=dt, use_pallas=on_tpu)
    pb = blk.init(jax.random.PRNGKey(0), x)
    f_blk = jax.jit(lambda a: blk.apply(pb, a))
    t_b = chain_time(f_blk, x)
    print(f"GridNetBlock:  {t_b*1e3:7.1f} ms  (attn+resid ≈ {max(t_b-t_i-t_n,0)*1e3:.1f} ms)")
    print(f"5-block model bound: {5*t_b*1e3:.0f} ms/forward; "
          f"30-step bound {b*(t-1)*256/16000/(30*5*t_b):.2f} audio-s/s")

    co = f_blk.lower(x).compile().cost_analysis()
    if co:
        print(f"block bytes={co.get('bytes accessed', 0)/1e9:.2f} GB "
              f"-> {co.get('bytes accessed', 0)/1e9/t_b:.0f} GB/s")


if __name__ == "__main__":
    main()
