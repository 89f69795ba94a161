"""Persistent XLA compilation cache setup.

On the target TPU toolchain an unrolled N=30 sampler compiles in
130-160 s (BENCH_NOTES.md); the persistent cache makes that a one-time
cost per program shape across processes and restarts (verified working
on this toolchain: second-process compile of the full N=30 enhance
program drops to seconds).

Called by every CLI before building models. Opt out with
``compilation_cache_dir: ""`` in the YAML config or
``FDBM_TPU_NO_COMPILE_CACHE=1``.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/fdbm_tpu/xla")


def setup_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir or None."""
    if os.environ.get("FDBM_TPU_NO_COMPILE_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   DEFAULT_CACHE_DIR)
    if not cache_dir:
        return None
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes noticeable time; entries are small
        # relative to the minutes they save
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
