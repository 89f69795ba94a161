"""Retry transient TPU backend-initialisation failures.

The tunnelled TPU backend can refuse to initialise for minutes at a time
('Unable to initialize backend: UNAVAILABLE', observed round-3). Backend
init failure is the only retryable error class: anything else propagates
immediately. jax caches init failures per process, so the cache is
cleared between attempts.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")


def retry_backend_init(fn: Callable[[], T], attempts: int = 3,
                       wait_s: float = 120.0) -> T:
    for attempt in range(attempts):
        try:
            return fn()
        except RuntimeError as e:
            retryable = "nable to initialize backend" in str(e)
            if not retryable or attempt == attempts - 1:
                raise
            print(f"# backend init failed (attempt {attempt + 1}/"
                  f"{attempts}), retrying in {wait_s:.0f}s", flush=True)
            time.sleep(wait_s)
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:
                pass
    raise AssertionError("unreachable")
