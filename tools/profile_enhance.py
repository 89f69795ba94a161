"""Device profile of the FULL production enhance program (bench.py path).

Captures one traced window of `FDBM.enhance_batch` (STFT + N-step sampler
+ iSTFT in one jit) at the bench shapes and aggregates per-op self time,
bucketed into categories (Pallas kernels / convs / FFT / elementwise glue)
so the residual between the stage-microbench bound and the measured
headline can be attributed.

Usage: python tools/profile_enhance.py [n_steps] [out_dir]
"""

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

CATEGORIES = [
    ("pallas_rnn", re.compile(r"grid_rnn|lstm", re.I)),
    ("pallas_attn", re.compile(r"attention|attn", re.I)),
    ("conv", re.compile(r"conv", re.I)),
    ("fft", re.compile(r"fft", re.I)),
    ("dot", re.compile(r"dot|einsum|matmul", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|reshape|bitcast|pad|slice|concat", re.I)),
]


def categorise(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    setup_compilation_cache()
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/enhance_prof"
    reps = 2

    backbone = os.environ.get("FDBM_TPU_PROFILE_BACKBONE",
                              "tfgridnet_5l32c100")
    cfg = FDBMConfig(
        mode="generative", backbone=backbone, bridge="sb",
        noise_schedule="bb", sampler_type="sde_ei", N=n_steps,
        inference_dtype="bfloat16",
    )
    fdbm = FDBM(cfg)
    params = fdbm.init_params(jax.random.PRNGKey(0))
    frames = int(os.environ.get("FDBM_TPU_PROFILE_FRAMES", "255"))
    batch, length = 16, frames * cfg.hop_length
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((batch, length)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    f = jax.jit(lambda p, a, k: fdbm.enhance_batch(p, a, k))
    f(params, y, key).block_until_ready()  # compile outside the trace

    jax.profiler.start_trace(out_dir)
    out = y
    for i in range(reps):
        out = f(params, out, jax.random.fold_in(key, i))
    out.block_until_ready()
    jax.profiler.stop_trace()
    print(f"trace written to {out_dir}", flush=True)

    for tj in sorted(glob.glob(os.path.join(
            out_dir, "**", "*.trace.json.gz"), recursive=True)):
        with gzip.open(tj, "rt") as fh:
            trace = json.load(fh)
        # Keep only DEVICE-plane per-op events: the perfetto dump
        # interleaves the host python/runtime lanes (compile, dispatch,
        # tracing frames) with the TPU op lanes, and the host lanes dwarf
        # the device ops if aggregated together. Process-metadata events
        # map pid -> plane name; device planes start with "/device:"
        # (matching the documented prefix exactly — a substring match on
        # "TPU" would pull in host-side "TPU runtime" lanes). Within the
        # device pid, thread-metadata maps tid -> lane name; we keep only
        # the "XLA Ops" lane — the "XLA Modules"/"Steps" summary lanes
        # duplicate the per-op durations and would double-count totals.
        meta = [e for e in trace.get("traceEvents", []) if e.get("ph") == "M"]
        dev_pids = {
            e.get("pid") for e in meta
            if e.get("name") == "process_name"
            and str(e.get("args", {}).get("name", "")).startswith("/device:")
        }
        op_tids = {
            (e.get("pid"), e.get("tid")) for e in meta
            if e.get("name") == "thread_name" and e.get("pid") in dev_pids
            and "XLA Ops" in str(e.get("args", {}).get("name", ""))
        }
        events = [e for e in trace.get("traceEvents", [])
                  if e.get("ph") == "X" and e.get("dur")
                  and (e.get("pid"), e.get("tid")) in op_tids]
        if not events:  # fall back to all device-pid events if no Ops lane
            events = [e for e in trace.get("traceEvents", [])
                      if e.get("ph") == "X" and e.get("dur")
                      and (not dev_pids or e.get("pid") in dev_pids)]
        agg, cats = {}, {}
        for e in events:
            name = e.get("name", "")
            agg.setdefault(name, [0, 0])
            agg[name][0] += e["dur"]
            agg[name][1] += 1
        for name, (dur, _) in agg.items():
            cats[categorise(name)] = cats.get(categorise(name), 0) + dur
        total = sum(v[0] for v in agg.values())
        print(f"\n== {os.path.basename(tj)} (total {total/1e3/reps:.1f} "
              f"ms/call across {len(events)} events) ==")
        print("-- categories --")
        for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"{dur/1e3/reps:9.2f} ms/call  {100*dur/total:5.1f}%  {cat}")
        print("-- top ops per category --")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        for cat in sorted(cats, key=lambda c: -cats[c]):
            print(f"  [{cat}]")
            shown = 0
            for name, (dur, cnt) in rows:
                if categorise(name) != cat:
                    continue
                print(f"  {dur/1e3/reps:9.3f} ms/call x{cnt:5d}  {name[:90]}")
                shown += 1
                if shown >= 8:
                    break
        break


if __name__ == "__main__":
    main()
