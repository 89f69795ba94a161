"""Benchmark: audio-seconds enhanced per wall-second per chip.

Measures the production inference path — the 30-step SDE-EI bridge sampler
on the flagship TF-GridNet 5l32c100 generative model (the reference's
default inference config: infer_folder.py N=30, config.yaml backbone) —
with padded-batch inference (batch of utterances per jit call), on
whatever accelerator JAX exposes (the driver runs this on one real TPU
chip).

Variance control (round-2): batch 16 (~65 audio-s per dispatch, so the
tunnel's 1-2.5 s dispatch latency is <5% of a call), dispatches issued
asynchronously, and the reported number is the best of three timed
windows (best-of: dispatch-latency noise is strictly additive).

Timing trust (round-2b): calls are dependency-CHAINED — each window feeds
the previous call's enhanced audio back in as the next noisy input — and
the window ends with a scalar device->host fetch. On the tunnelled runtime
`block_until_ready` can return before compute finishes and identical-arg
dispatches can be elided outright (tools/timing.py documents the
measurements), so wall-clocking independent dispatches is untrustworthy;
a chain serialised by data dependencies is not.

Numerics (round-2): the production serving configuration is
`inference_dtype=bfloat16` — the program is HBM-bandwidth-bound
(BENCH_NOTES roofline: fp32 runs at 75% of v5e HBM peak) and bf16 kernel
I/O streams give 1.67x. Quality evidence: on a trained model the bf16
path agrees with fp32 at 22 dB SI-SDR and leaves the enhanced-vs-clean
metric unchanged (BENCH_NOTES round-2); recurrence math inside the
Pallas kernel and all norm statistics stay fp32. fp32 measures 4.47
audio-s/s/chip with the same harness.

Baseline note: the reference publishes no throughput numbers
(BASELINE.md). `vs_baseline` divides by 1.0 audio-second/sec/chip — the
estimated reference operating point (RTF ~1.0) for its one-file-at-a-time
30-step PyTorch sampler on an A100, consistent with published RTFs for
30-step score-based speech enhancement at 16 kHz (SGMSE+ class). A
measured anchor on this image's CPU and the FLOPs-based A100 estimate are
recorded in BENCH_NOTES.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fdbm_tpu.model import FDBM, FDBMConfig
    from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

    setup_compilation_cache()

    # Side-measurement knobs (the headline run uses the defaults): lets the
    # same trusted chained-slope harness time other backbones / dtypes /
    # step counts (e.g. NCSN++ serving points for BENCH_NOTES).
    n_steps = int(os.environ.get("FDBM_TPU_BENCH_STEPS", "30"))
    batch = int(os.environ.get("FDBM_TPU_BENCH_BATCH", "16"))
    backbone = os.environ.get("FDBM_TPU_BENCH_BACKBONE", "tfgridnet_5l32c100")
    inf_dtype = os.environ.get("FDBM_TPU_BENCH_DTYPE", "bfloat16")
    num_frames = 256  # 4.08 s of 16 kHz audio per utterance at hop 256
    sr = 16000

    cfg = FDBMConfig(
        mode="generative",
        backbone=backbone,
        bridge="sb",
        noise_schedule="bb",
        sampler_type="sde_ei",
        N=n_steps,
        inference_dtype=inf_dtype,  # production serving numerics (see above)
    )
    fdbm = FDBM(cfg)
    params = fdbm.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    length = (num_frames - 1) * cfg.hop_length
    y_audio = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, length)).astype(np.float32) * 0.1))

    # Full audio->audio production path: STFT + 30-step sampler + iSTFT in
    # one fused device program (real-valued jit boundary).
    @jax.jit
    def enhance(params, y_audio, key):
        return fdbm.enhance_batch(params, y_audio, key)

    sync = jax.jit(lambda a: jnp.sum(jnp.abs(a)))

    key = jax.random.PRNGKey(1)
    # Warmup / compile (the chain feeds outputs back in, so shapes match)
    float(sync(enhance(params, y_audio, key)))

    def chain(k: int, salt: int) -> float:
        """Run k dependency-chained enhance calls, return wall seconds.

        Each call consumes the previous enhanced audio, so the device
        cannot overlap or elide the calls; the final scalar fetch cannot
        complete before the whole chain ran.
        """
        t0 = time.perf_counter()
        out = y_audio
        for i in range(k):
            out = enhance(params, out, jax.random.fold_in(key, salt * 16 + i))
        float(sync(out))
        return time.perf_counter() - t0

    # Slope timing: T(k) = tunnel_roundtrip + k * t_call, so the seconds-
    # scale tunnel latency cancels in the slope. Tunnel noise is strictly
    # additive, so the consistent estimator is min over the long runs minus
    # min over the short runs — NOT min over pairwise differences, which a
    # single noisy short run would bias optimistically.
    k_short, k_long = 1, 5
    longs = [chain(k_long, 2 * w + 1) for w in range(2)]
    shorts = [chain(k_short, 2 * w) for w in range(2)]
    dt = (min(longs) - min(shorts)) / (k_long - k_short)

    audio_seconds = batch * length / sr
    throughput = audio_seconds / dt  # audio-sec enhanced per wall-sec per chip

    baseline = 1.0  # estimated reference RTF~1.0 (see module docstring)
    metric = "audio_sec_enhanced_per_sec_per_chip_30step"
    if (backbone, inf_dtype, n_steps) != ("tfgridnet_5l32c100", "bfloat16", 30):
        # side measurement: name carries the configuration
        metric = (f"audio_sec_enhanced_per_sec_per_chip_{n_steps}step"
                  f"_{backbone}_{inf_dtype}")
    record = {
        "metric": metric,
        "value": round(throughput, 3),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(throughput / baseline, 3),
        # The denominator is an ESTIMATE (reference publishes no throughput
        # numbers; RTF~1.0 A100 reasoning in the module docstring). The
        # measured anchor for the reference code on THIS image's CPU is
        # 0.0035 audio-s/s (BENCH_NOTES.md) — vs_baseline against that
        # measured anchor would be value/0.0035.
        "baseline_is_estimate": True,
        "baseline_estimate_audio_s_per_s": baseline,
        "measured_cpu_anchor_audio_s_per_s": 0.0035,
    }
    # Training-throughput regression tracking (bench_train.py): embedded
    # in the same single JSON line so the recorded benchmark carries both
    # serving and training numbers. Skippable for quick serving-only runs.
    if os.environ.get("FDBM_TPU_BENCH_NO_TRAIN", "0") != "1":
        try:
            from bench_train import train_numbers

            record["train"] = train_numbers()
        except Exception as e:  # training bench must not sink the headline
            record["train"] = {"error": str(e)[:200]}
        # NCSN++ train datapoints (VERDICT r4 #6) — same harness, second
        # backbone; isolated so a failure can't sink the rest.
        try:
            from bench_train import train_numbers as _tn

            record["train_ncsnpp_5M"] = _tn("ncsnpp_v2_5M")
        except Exception as e:
            record["train_ncsnpp_5M"] = {"error": str(e)[:200]}
    print(json.dumps(record))


if __name__ == "__main__":
    import os as _os

    from fdbm_tpu.utils.backend_retry import (ensure_backend,
                                              retry_backend_init)

    # Fail fast (exit 3) if backend INIT hangs outright — the tunnel's
    # other failure mode besides the retryable init error.
    ensure_backend(float(_os.environ.get("FDBM_TPU_INIT_TIMEOUT", "900")))

    # A round-end bench run must survive a tunnel blip (utils/backend_retry).
    retry_backend_init(main)
