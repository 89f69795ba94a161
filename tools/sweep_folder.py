"""End-to-end folder-serving sweep at scale (VERDICT round-2 weak #2).

Synthesises N mixed-length wav files (two bucket shapes: ~4 s and ~8 s,
the round-2b sweep mix), then runs the production `enhance_folder`
driver (pipelined reader/writer threads, bucketed batching) on the
flagship config and reports end-to-end audio-s/s — the number to compare
against bench.py's steady-state window (target: within ~15%).

Usage: python tools/sweep_folder.py [n_files] [N_steps]
Env knobs (CPU smoke): SWEEP_BACKBONE, SWEEP_BATCH, SWEEP_SECONDS
(comma pair, default "4,8").
"""

import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    import jax

    if os.environ.get("SWEEP_CPU"):  # CPU smoke: the axon sitecustomize
        # ignores JAX_PLATFORMS, so force CPU before any device use
        jax.config.update("jax_platforms", "cpu")

    from fdbm_tpu.infer import enhance_folder
    from fdbm_tpu.model import FDBM, FDBMConfig
    from fdbm_tpu.utils.audio import write_wav
    from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

    setup_compilation_cache()

    secs = [float(s) for s in
            os.environ.get("SWEEP_SECONDS", "4,8").split(",")]
    backbone = os.environ.get("SWEEP_BACKBONE", "tfgridnet_5l32c100")
    batch = int(os.environ.get("SWEEP_BATCH", "16"))

    root = tempfile.mkdtemp(prefix="sweep_")
    noisy = os.path.join(root, "noisy")
    out = os.path.join(root, "enhanced")
    os.makedirs(noisy)
    rng = np.random.default_rng(0)
    sr = 16000
    total_audio = 0.0
    for i in range(n_files):
        # two bucket shapes, round-2b mix: ~4 s and ~8 s (exact lengths
        # jittered so the driver's padding logic is exercised)
        base = secs[i % len(secs)]
        length = int((base + rng.uniform(-0.3, 0.3) * base / 4) * sr)
        total_audio += length / sr
        x = (0.1 * rng.standard_normal(length)).astype(np.float32)
        write_wav(os.path.join(noisy, f"f{i:04d}.wav"), x, sr)
    print(f"generated {n_files} files, {total_audio:.0f} audio-s", flush=True)

    cfg = FDBMConfig(
        mode="generative", backbone=backbone, bridge="sb",
        noise_schedule="bb", sampler_type="sde_ei", N=n_steps,
        inference_dtype="bfloat16",
    )
    fdbm = FDBM(cfg)
    params = fdbm.init_params(jax.random.PRNGKey(0))

    stats = enhance_folder(
        fdbm, params, test_dir=noisy, enhanced_dir=out,
        N=n_steps, batch_size=batch, progress=False,
    )
    print(f"files={stats.files} failures={stats.failures} "
          f"audio_s={stats.audio_seconds:.1f} wall_s={stats.wall_seconds:.1f} "
          f"prewarm_s={stats.prewarm_seconds:.1f} "
          f"read_s={stats.read_seconds:.1f} "
          f"enhance_s={stats.enhance_seconds:.1f} "
          f"drain_s={stats.write_drain_seconds:.1f} "
          f"end-to-end={stats.throughput:.2f} "
          f"steady={stats.steady_throughput:.2f} "
          f"enhance-loop={stats.audio_seconds / stats.enhance_seconds if stats.enhance_seconds else 0.0:.2f} audio-s/s",
          flush=True)
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
