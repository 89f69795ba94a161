"""Fused-vs-XLA training loss-trajectory equivalence run (VERDICT r4 #1).

Runs the SAME 50 training steps (identical synthetic data, identical PRNG
keys, identical init) three times on one backend:

  A. XLA scan train path          (FDBM_TPU_TRAIN_KERNEL=0)
  B. fused Pallas train kernel    (FDBM_TPU_TRAIN_KERNEL=1)
  C. the SAME XLA scan path under jax.default_matmul_precision
     ("highest") — the platform-noise CONTROL: on TPU the default fp32
     matmul lowering runs bf16 MXU passes, so two valid fp32 programs
     (default XLA vs precision-highest XLA vs the Pallas kernel's own
     accumulation) legitimately differ at the bf16-pass rounding scale;
     C-vs-A measures exactly how much the XLA path moves against ITSELF
     under a different-but-equally-valid matmul rounding.  (A first run
     with a 1e-6 input-perturbation control measured max dev 9.1% vs the
     fused path's 9.8% over 50 steps — same chaotic envelope — but
     under-called the step-0 scale because matmul-precision noise is
     ~1e-3, far above 1e-6 input noise.)

Equivalence criterion (self-calibrating): the trajectories are chaotic
walks — after a few optimiser steps ANY rounding difference amplifies to
percent-level loss deviations (measured: the precision-highest control
itself deviates 10.2% max over 50 steps), and per-step ratios between
two independent chaotic walks are noise.  The statistically meaningful
gates are therefore:
  * step-0 deviation (one forward+loss, PRE-chaos) < 3e-3 — the direct
    kernel-equivalence signal at the platform matmul-rounding scale;
  * envelope: max and final |A-B|/A within 3x of the control's
    max |A-C|/A — the fused walk stays inside the platform's own
    rounding-divergence cone (measured r5: fused max 9.8% vs control
    max 10.2% — the fused kernel diverges LESS than XLA against itself
    under a different valid matmul precision);
  * both trajectories descend (last < 0.8 * first).
The kernel-level VJP is exact to ~3e-7 (tests/test_gridrnn_train.py);
this run shows the end-to-end TRAINING trajectory is statistically the
same optimisation path.

Usage:  python tools/train_traj_equiv.py [steps]
Prints one JSON line with the per-step deviations and the verdict;
record the result in BENCH_NOTES.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def run_trajectory(train_kernel: bool, precision: str = ""):
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.environ["FDBM_TPU_TRAIN_KERNEL"] = "1" if train_kernel else "0"
    from fdbm_tpu.model import FDBM, FDBMConfig

    cfg = FDBMConfig(
        mode="generative", backbone="tfgridnet_5l32c100", bridge="sb",
        noise_schedule="bb", loss_type="data_prediction_hybrid",
        num_frames=64,
    )
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    length = (cfg.num_frames - 1) * cfg.hop_length
    batch = 2

    rng = np.random.default_rng(0)
    x = rng.standard_normal((STEPS, batch, length)).astype(np.float32) * 0.1
    y = x + rng.standard_normal((STEPS, batch, length)).astype(np.float32) * 0.02

    import contextlib
    ctx = (jax.default_matmul_precision(precision) if precision
           else contextlib.nullcontext())
    with ctx:
        step = jax.jit(fdbm.train_step, donate_argnums=0)
        losses = []
        for i in range(STEPS):
            state, metrics = step(state,
                                  (jnp.asarray(x[i]), jnp.asarray(y[i])),
                                  jax.random.PRNGKey(1000 + i))
            losses.append(float(metrics["train_loss"]))
    return losses


def main():
    a = run_trajectory(train_kernel=False)
    b = run_trajectory(train_kernel=True)
    c = run_trajectory(train_kernel=False, precision="highest")

    dev_ab = [abs(ai - bi) / max(abs(ai), 1e-9) for ai, bi in zip(a, b)]
    dev_ac = [abs(ai - ci) / max(abs(ai), 1e-9) for ai, ci in zip(a, c)]
    control_env = max(max(dev_ac), 1e-3)
    ok = (dev_ab[0] < 3e-3                       # pre-chaos forward parity
          and max(dev_ab) <= 3 * control_env     # envelope
          and dev_ab[-1] <= 3 * control_env
          and a[-1] < 0.8 * a[0]                 # both descend
          and b[-1] < 0.8 * b[0])
    print(json.dumps({
        "steps": STEPS,
        "loss_first_xla": a[0], "loss_last_xla": a[-1],
        "loss_first_fused": b[0], "loss_last_fused": b[-1],
        "max_dev_fused_vs_xla": max(dev_ab),
        "max_dev_control": max(dev_ac),
        "final_dev_fused_vs_xla": dev_ab[-1],
        "final_dev_control": dev_ac[-1],
        "equivalent": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
