"""Microbenchmark: ONE backbone forward at the bench.py shapes.

Isolates the per-sampler-step cost (bench.py = 30 of these + STFT/iSTFT)
so kernel/dataflow changes can be measured in seconds instead of minutes.

Usage: python tools/microbench_forward.py [fp32|bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fdbm_tpu.models import BackboneRegistry
from fdbm_tpu.utils.compilation_cache import setup_compilation_cache
from tools.timing import chain_time


def main():
    setup_compilation_cache()
    dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") else jnp.float32
    b, f, t = 16, 257, 256
    on_tpu = jax.default_backend() == "tpu"
    dnn = BackboneRegistry.get_by_name("tfgridnet_5l32c100")(
        dtype=dt, use_pallas=on_tpu)

    rng = np.random.default_rng(0)
    # complex64 cannot cross the host/device boundary on this runtime
    # (BENCH_NOTES): keep host data real, build complex inside jit.
    xr, xi, yr, yi = (jnp.asarray(rng.standard_normal((b, 1, f, t)),
                                  jnp.float32) for _ in range(4))
    tt = jnp.full((b,), 0.5, jnp.float32)

    params = jax.jit(
        lambda xr, xi, yr, yi, tt: dnn.init(
            jax.random.PRNGKey(0), jax.lax.complex(xr, xi),
            jax.lax.complex(yr, yi), tt)
    )(xr, xi, yr, yi, tt)

    @jax.jit
    def fwd(params, xr, xi, yr, yi, tt):
        x = jax.lax.complex(xr, xi)
        y = jax.lax.complex(yr, yi)
        return jnp.real(dnn.apply(params, x, y, tt))

    t0 = time.perf_counter()
    fwd(params, xr, xi, yr, yi, tt).block_until_ready()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")

    # chained timing (tools/timing.py): naive dispatch wall-clocking is
    # untrustworthy on the tunnelled runtime
    best = chain_time(lambda a: fwd(params, a, xi, yr, yi, tt), xr)
    audio_s = b * (t - 1) * 256 / 16000
    print(f"forward: {best*1e3:.1f} ms  ({dt.__name__})  "
          f"-> 30-step bound {audio_s/(30*best):.2f} audio-s/s")

    co = fwd.lower(params, xr, xi, yr, yi, tt).compile().cost_analysis()
    if co:
        print(f"flops={co.get('flops', 0)/1e9:.1f} G  "
              f"bytes={co.get('bytes accessed', 0)/1e9:.1f} GB  "
              f"-> {co.get('bytes accessed', 0)/1e9/best:.0f} GB/s")


if __name__ == "__main__":
    main()
