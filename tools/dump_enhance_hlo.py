"""Dump the optimized HLO of the production enhance program (bench shapes)
so profiler fusion names (fusion.NNN, *_fusion.NNN) can be attributed to
Python source via their op_name metadata.

Usage: python tools/dump_enhance_hlo.py [n_steps] [out.txt]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.utils.compilation_cache import setup_compilation_cache


def main():
    setup_compilation_cache()
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/enhance_hlo.txt"

    backbone = os.environ.get("FDBM_TPU_PROFILE_BACKBONE",
                              "tfgridnet_5l32c100")
    cfg = FDBMConfig(
        mode="generative", backbone=backbone, bridge="sb",
        noise_schedule="bb", sampler_type="sde_ei", N=n_steps,
        inference_dtype="bfloat16",
    )
    fdbm = FDBM(cfg)
    params = fdbm.init_params(jax.random.PRNGKey(0))
    frames = int(os.environ.get("FDBM_TPU_PROFILE_FRAMES", "255"))
    batch, length = 16, frames * cfg.hop_length
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((batch, length)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    f = jax.jit(lambda p, a, k: fdbm.enhance_batch(p, a, k))
    compiled = f.lower(params, y, key).compile()
    txt = compiled.as_text()
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
