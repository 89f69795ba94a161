"""Device profile + HLO dump of one TRAINING step (fwd+bwd), bench_train
shapes (VERDICT r3 #7): batch-2 no-remat by default.

Writes the trace under <out_dir>, the optimized HLO beside it, and prints
the per-category aggregate; feed both to tools/attr_profile.py for
source-line attribution of the backward pass.

Usage: python tools/profile_train.py [batch] [remat 0|1] [out_dir] [backbone]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fdbm_tpu.model import FDBM, FDBMConfig
    from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

    setup_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.profiles/train_r4"
    backbone = sys.argv[4] if len(sys.argv) > 4 else "tfgridnet_5l32c100"

    cfg = FDBMConfig(
        mode="generative", backbone=backbone, bridge="sb",
        noise_schedule="bb", loss_type="data_prediction_hybrid", remat=remat,
    )
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    length = (256 - 1) * cfg.hop_length
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, length)).astype(np.float32) * 0.1)
    y = x + jnp.asarray(
        rng.standard_normal((batch, length)).astype(np.float32) * 0.02)

    step = jax.jit(fdbm.train_step)
    key = jax.random.PRNGKey(1)
    lowered = step.lower(state, (x, y), key)
    compiled = lowered.compile()
    hlo_path = os.path.join(out_dir, "train_hlo.txt")
    os.makedirs(out_dir, exist_ok=True)
    with open(hlo_path, "w") as fh:
        fh.write(compiled.as_text())
    print(f"hlo -> {hlo_path}")

    state, m = step(state, (x, y), key)
    float(m["train_loss"])  # warmup

    reps = 4
    jax.profiler.start_trace(out_dir)
    mm = None
    for i in range(reps):
        state, mm = step(state, (x, y), jax.random.fold_in(key, i))
    float(mm["train_loss"])
    jax.profiler.stop_trace()
    print(f"trace -> {out_dir} (reps={reps}); attribute with:\n"
          f"  python tools/attr_profile.py {out_dir} {hlo_path} {reps}")


if __name__ == "__main__":
    main()
