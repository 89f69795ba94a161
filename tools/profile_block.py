"""Capture a device profile of one GridNetBlock forward and print the
per-op time table (round-3: targets the residual XLA glue between the
Pallas kernels).

Usage: python tools/profile_block.py [fp32|bf16] [out_dir]
Prints the top ops by self-time parsed from the trace .xplane.pb via
tensorflow's profiler analysis if available, else leaves the raw trace
directory for manual inspection.
"""

import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fdbm_tpu.models.tfgridnet import GridNetBlock  # noqa: E402
from fdbm_tpu.utils.compilation_cache import setup_compilation_cache  # noqa: E402


def main():
    setup_compilation_cache()
    dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] != "fp32") else jnp.float32
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/block_prof"
    on_tpu = jax.default_backend() == "tpu"
    b, t, q, c = 16, 256, 257, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, q, c)), dt)

    blk = GridNetBlock(emb_dim=c, hidden=100, use_pallas=on_tpu, dtype=dt)
    params = blk.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda a: blk.apply(params, a))
    f(x).block_until_ready()  # compile outside the trace

    jax.profiler.start_trace(out_dir)
    y = x
    for _ in range(8):
        y = f(y)
    y.block_until_ready()
    jax.profiler.stop_trace()
    print(f"trace written to {out_dir}", flush=True)

    # Try the perfetto trace.json.gz the profiler also writes: it carries
    # per-op durations we can aggregate without TensorBoard.
    for tj in sorted(glob.glob(os.path.join(
            out_dir, "**", "*.trace.json.gz"), recursive=True)):
        with gzip.open(tj, "rt") as fh:
            trace = json.load(fh)
        events = [e for e in trace.get("traceEvents", [])
                  if e.get("ph") == "X" and e.get("dur")]
        # keep device-thread events only (XLA op names contain '%'or fusion)
        agg = {}
        for e in events:
            name = e.get("name", "")
            agg.setdefault(name, [0, 0])
            agg[name][0] += e["dur"]
            agg[name][1] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total = sum(v[0] for v in agg.values())
        print(f"\n== {os.path.basename(tj)} (total {total/1e3:.1f} ms across "
              f"{len(events)} events) ==")
        for name, (dur, cnt) in rows[:25]:
            print(f"{dur/1e3/8:9.3f} ms/iter x{cnt:4d}  {name[:90]}")
        break


if __name__ == "__main__":
    main()
