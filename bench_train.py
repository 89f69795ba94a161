"""Training-throughput benchmark: audio-seconds trained per wall-second
per chip on the flagship config (TF-GridNet 5l32c100 generative, hybrid
loss — reference config.yaml), so training perf can't silently regress.

Two operating points:
* batch 2, remat off — the reference's own per-GPU operating point
  (config.yaml:34 "batch size per gpu: 2");
* batch 8, remat on — the v5e-1 HBM-bound large-batch point (without
  jax.checkpoint per block the activation streams OOM; STATUS r2b).

Timing discipline matches bench.py: steps are dependency-chained through
the TrainState, the window ends with a scalar device->host fetch, and the
estimate is the slope (min-of-longs - min-of-shorts)/dk so the tunnel's
per-dispatch latency cancels (tools/timing.py).

Standalone: prints one JSON line per operating point.  bench.py embeds
the same numbers into its single benchmark line under the "train" key.
"""

import json
import time

import numpy as np


def measure_train(remat: bool, batch: int, k_short: int = 1,
                  k_long: int = 4, windows: int = 2,
                  backbone: str = "tfgridnet_5l32c100") -> float:
    """Returns audio-seconds trained per wall-second per chip."""
    import jax
    import jax.numpy as jnp

    from fdbm_tpu.model import FDBM, FDBMConfig

    num_frames = 256
    sr = 16000
    cfg = FDBMConfig(
        mode="generative",
        backbone=backbone,
        bridge="sb",
        noise_schedule="bb",
        loss_type="data_prediction_hybrid",
        remat=remat,
    )
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    length = (num_frames - 1) * cfg.hop_length

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, length)).astype(np.float32) * 0.1)
    y = x + jnp.asarray(rng.standard_normal((batch, length)).astype(np.float32) * 0.02)

    step = jax.jit(fdbm.train_step, donate_argnums=0)
    key = jax.random.PRNGKey(1)

    state, metrics = step(state, (x, y), key)
    float(metrics["train_loss"])  # warmup / compile

    def chain(k: int, salt: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(k):
            state, m = step(state, (x, y), jax.random.fold_in(key, salt * 16 + i))
        float(m["train_loss"])  # forces the whole state chain
        return time.perf_counter() - t0

    longs = [chain(k_long, 2 * w + 1) for w in range(windows)]
    shorts = [chain(k_short, 2 * w) for w in range(windows)]
    dt = (min(longs) - min(shorts)) / (k_long - k_short)
    return batch * length / sr / dt


def train_numbers(backbone: str = "tfgridnet_5l32c100") -> dict:
    """Both operating points, keyed for the bench.py JSON line."""
    return {
        "no_remat_b2": round(measure_train(remat=False, batch=2,
                                           backbone=backbone), 3),
        "remat_b8": round(measure_train(remat=True, batch=8,
                                        backbone=backbone), 3),
        "unit": "train_audio_s/s/chip",
        "backbone": backbone,
    }


def main():
    import sys

    from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

    setup_compilation_cache()
    backbone = sys.argv[1] if len(sys.argv) > 1 else "tfgridnet_5l32c100"
    nums = train_numbers(backbone)
    for k in ("no_remat_b2", "remat_b8"):
        print(json.dumps({
            "metric": f"train_audio_sec_per_sec_per_chip_{k}",
            "value": nums[k],
            "unit": "audio_s/s/chip",
            "backbone": backbone,
            "vs_baseline": nums[k],
        }))


if __name__ == "__main__":
    import os as _os

    from fdbm_tpu.utils.backend_retry import (ensure_backend,
                                              retry_backend_init)

    # Fail fast (exit 3) if backend INIT hangs outright — the tunnel's
    # other failure mode besides the retryable init error.
    ensure_backend(float(_os.environ.get("FDBM_TPU_INIT_TIMEOUT", "900")))

    retry_backend_init(main)
