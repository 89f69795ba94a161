"""Trustworthy device timing on the tunnelled (axon) TPU runtime.

On this runtime `block_until_ready` can return before compute finishes and
independent dispatches pipeline behind a seconds-scale tunnel latency, so
naive timing is untrustworthy in both directions. `chain_time` measures the
per-call device time of `f` by running two dependency-CHAINED sequences of
different lengths and taking the slope:

    T(k) = roundtrip + k * t_compute

A chained sequence (each call consumes the previous call's output) cannot
overlap compute, and the final scalar fetch cannot complete before the whole
chain has executed on device.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


@jax.jit
def _reduce(x):
    return jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)))


def _sync_scalar(x) -> float:
    # Force a device->host read that depends on x. Goes through a jitted
    # reduction: bare reshape/index dispatches can hit UNIMPLEMENTED on the
    # tunnelled backend for some ranks.
    return float(_reduce(x))


def chain_time(f, x0, k_short: int = 2, k_long: int = 10, reps: int = 2) -> float:
    """Per-call device seconds of x -> f(x) (same-shape in/out), slope method.

    Tunnel latency noise is strictly additive, so the estimator takes
    min over the long runs minus min over the short runs (min over
    *pairwise* slopes would let one noisy short run bias the result low).
    """

    def run(k: int) -> float:
        x = x0
        t0 = time.perf_counter()
        for _ in range(k):
            x = f(x)
        _sync_scalar(x)
        return time.perf_counter() - t0

    run(1)  # warmup/compile
    shorts = [run(k_short) for _ in range(reps)]
    longs = [run(k_long) for _ in range(reps)]
    return (min(longs) - min(shorts)) / (k_long - k_short)
