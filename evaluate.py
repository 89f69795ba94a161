#!/usr/bin/env python
"""Metric evaluation CLI: compare enhanced wavs against clean references.

    python evaluate.py --clean_dir /data/test/clean --enhanced_dir out/ \
        [--noisy_dir /data/test/noisy]

Reports mean +- std (and 95% CI) of SI-SDR, ESTOI, and PESQ-WB (via the
ITU `pesq` package when importable, else the vendored P.862.2 estimator
in fdbm_tpu.pesq_loss); with --noisy_dir also reports SI-SIR/SI-SAR
energy ratios (reference fdbm/util/other.py:25-32,98-107).
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob

import numpy as np

from fdbm_tpu.utils import metrics as M
from fdbm_tpu.utils.audio import read_wav, resample


def _load(path: str, sr: int = 16000) -> np.ndarray:
    x, file_sr = read_wav(path)
    x = x[0]
    if file_sr != sr:
        x = resample(x, file_sr, sr)
    return x


def main():
    # Multi-host runtime wiring (no-op on a single host): after this,
    # jax.devices() spans the pod and process_index()/process_count()
    # drive file sharding (reference DDP/rank semantics).
    from fdbm_tpu.parallel import initialize
    from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

    initialize()
    setup_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--clean_dir", required=True)
    ap.add_argument("--enhanced_dir", required=True)
    ap.add_argument("--noisy_dir", default=None)
    ap.add_argument("--sr", type=int, default=16000)
    args = ap.parse_args()

    enhanced = sorted(glob(os.path.join(args.enhanced_dir, "**", "*.wav"),
                           recursive=True))
    results = {"si_sdr": [], "estoi": [], "pesq": [], "si_sir": [], "si_sar": []}
    missing = 0
    for ep in enhanced:
        rel = os.path.relpath(ep, args.enhanced_dir)
        cp = os.path.join(args.clean_dir, rel)
        if not os.path.exists(cp):
            cp = os.path.join(args.clean_dir, os.path.basename(ep))
        if not os.path.exists(cp):
            missing += 1
            continue
        x = _load(cp, args.sr)
        x_hat = _load(ep, args.sr)
        n = min(len(x), len(x_hat))
        x, x_hat = x[:n], x_hat[:n]
        results["si_sdr"].append(M.si_sdr(x, x_hat))
        e = M.estoi(x, x_hat, args.sr)
        if np.isfinite(e):
            results["estoi"].append(e)
        p = M.pesq_wb(args.sr, x, x_hat)
        if p is not None:
            results["pesq"].append(p)
        if args.noisy_dir:
            np_path = os.path.join(args.noisy_dir, rel)
            if os.path.exists(np_path):
                y = _load(np_path, args.sr)[:n]
                sdr, sir, sar = M.energy_ratios(x_hat, x, y - x)
                results["si_sir"].append(sir)
                results["si_sar"].append(sar)

    summary = {}
    for k, v in results.items():
        if v:
            mean, std = M.mean_std(np.asarray(v))
            ci = M.mean_conf_int(v)[1] if len(v) > 1 else 0.0
            summary[k] = {"mean": round(mean, 4), "std": round(std, 4),
                          "ci95": round(ci, 4), "n": len(v)}
    summary["files"] = len(enhanced)
    summary["missing_refs"] = missing
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
