"""Microbenchmark: ONE backbone forward at the bench.py shapes.

Isolates the per-sampler-step cost (bench.py = 30 of these + STFT/iSTFT)
so kernel/dataflow changes can be measured in seconds instead of minutes.

Usage: python tools/microbench_forward.py [fp32|bf16] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fdbm_tpu.models import BackboneRegistry
from fdbm_tpu.utils.compilation_cache import setup_compilation_cache


def main():
    setup_compilation_cache()
    dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") else jnp.float32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b, f, t = 16, 257, 256
    on_tpu = jax.default_backend() == "tpu"
    dnn = BackboneRegistry.get_by_name("tfgridnet_5l32c100")(
        dtype=dt, use_pallas=on_tpu)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 1, f, t)) +
                    1j * rng.standard_normal((b, 1, f, t)), jnp.complex64)
    y = jnp.asarray(rng.standard_normal((b, 1, f, t)) +
                    1j * rng.standard_normal((b, 1, f, t)), jnp.complex64)
    tt = jnp.full((b,), 0.5, jnp.float32)

    params = dnn.init(jax.random.PRNGKey(0), x, y, tt)

    @jax.jit
    def fwd(params, xr, xi, yr, yi, tt):
        x = jax.lax.complex(xr, xi)
        y = jax.lax.complex(yr, yi)
        return jnp.real(dnn.apply(params, x, y, tt))

    args = (params, jnp.real(x), jnp.imag(x), jnp.real(y), jnp.imag(y))
    t0 = time.perf_counter()
    out = fwd(*args, tt)
    out.block_until_ready()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")

    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            # vary t per call: identical-arg dispatches can be elided by the
            # tunnelled runtime (measured 0.5 ms/call, physically impossible)
            out = fwd(*args, tt + (w * iters + i) * 1e-4)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    audio_s = b * (t - 1) * 256 / 16000
    print(f"forward: {best*1e3:.1f} ms  ({dt.__name__})  "
          f"-> 30-step bound {audio_s/(30*best):.2f} audio-s/s")

    co = fwd.lower(*args, tt).compile().cost_analysis()
    if co:
        print(f"flops={co.get('flops', 0)/1e9:.1f} G  "
              f"bytes={co.get('bytes accessed', 0)/1e9:.1f} GB  "
              f"-> {co.get('bytes accessed', 0)/1e9/best:.0f} GB/s")


if __name__ == "__main__":
    main()
