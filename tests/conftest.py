"""Test config: force a virtual 8-device CPU mesh before JAX initialises.

This is how multi-device (data-parallel) behaviour is tested without real
multi-chip hardware (SURVEY.md section 4, point 5).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup, so the env var
# alone is too late; override via jax.config before any backend initialises.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
