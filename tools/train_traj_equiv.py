"""Fused-vs-XLA training loss-trajectory equivalence run (VERDICT r4 #1).

Runs the SAME 50 training steps (identical synthetic data, identical PRNG
keys, identical init) three times on one backend:

  A. XLA scan train path          (FDBM_TPU_TRAIN_KERNEL=0)
  B. fused Pallas train kernel    (FDBM_TPU_TRAIN_KERNEL=1)
  C. XLA scan path with the input audio perturbed by 1e-6 relative noise
     — the intrinsic-chaos CONTROL: it bounds how fast ANY fp32 rounding
     difference (including a bit-exact reimplementation with different
     op order) must diverge the trajectory.

Equivalence criterion (self-calibrating): at every step the |A-B|/A loss
deviation must stay under max(1e-3, 3x the control deviation |A-C|/A at
that step).  The kernel-level VJP is exact to ~3e-7
(tests/test_gridrnn_train.py); this run shows the end-to-end TRAINING
trajectory is statistically the same optimisation path.

Usage:  python tools/train_traj_equiv.py [steps]
Prints one JSON line with the per-step deviations and the verdict;
record the result in BENCH_NOTES.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def run_trajectory(train_kernel: bool, perturb: float = 0.0):
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
    if perturb:
        pert = np.random.default_rng(123).standard_normal(x.shape)
        x = (x * (1 + perturb * pert)).astype(np.float32)

    step = jax.jit(fdbm.train_step, donate_argnums=0)
    losses = []
    for i in range(STEPS):
        state, metrics = step(state, (jnp.asarray(x[i]), jnp.asarray(y[i])),
                              jax.random.PRNGKey(1000 + i))
        losses.append(float(metrics["train_loss"]))
    return losses


def main():
    a = run_trajectory(train_kernel=False)
    b = run_trajectory(train_kernel=True)
    c = run_trajectory(train_kernel=False, perturb=1e-6)

    dev_ab = [abs(ai - bi) / max(abs(ai), 1e-9) for ai, bi in zip(a, b)]
    dev_ac = [abs(ai - ci) / max(abs(ai), 1e-9) for ai, ci in zip(a, c)]
    gates = [max(1e-3, 3 * d) for d in dev_ac]
    ok = all(d <= g for d, g in zip(dev_ab, gates))
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
