#!/usr/bin/env python
"""Single-file inference CLI (reference infer_single.py).

    python infer_single.py -C configs/config_infer_single.yaml \
        [noisy_file=... output_file=... N=30 sampler_type=sde_ei]
"""

from __future__ import annotations

import argparse

import jax

from fdbm_tpu.checkpoint import load_checkpoint_config
from fdbm_tpu.config import load_config, parse_cli_overrides
from fdbm_tpu.infer import enhance_single
from fdbm_tpu.model import FDBM, FDBMConfig


def load_model_from_ckpt(ckpt_dir: str, slot: str = "best_pesq",
                         overrides: dict | None = None):
    """Rebuild the model from a checkpoint's self-describing config
    (reference uses Lightning load_from_checkpoint, infer_single.py:54).

    ``ckpt_dir`` may also be a reference PyTorch-Lightning ``.ckpt`` FILE:
    weights (EMA shadow when present) and hyperparameters are imported via
    fdbm_tpu.utils.torch_port — the migration path for users bringing
    checkpoints trained with the reference."""
    import os

    if os.path.isfile(ckpt_dir) and ckpt_dir.endswith(".ckpt"):
        return load_model_from_torch_ckpt(ckpt_dir, overrides)
    # Accept a slot directory directly (e.g. <run>/checkpoints/last):
    # meta.json lives in the checkpoints dir, so resolve to the parent
    # and use the basename as the slot.
    meta = os.path.join(ckpt_dir, "meta.json")
    parent_meta = os.path.join(os.path.dirname(ckpt_dir), "meta.json")
    if not os.path.exists(meta) and os.path.exists(parent_meta):
        slot = os.path.basename(os.path.normpath(ckpt_dir))
        ckpt_dir = os.path.dirname(os.path.normpath(ckpt_dir))
    cfg_blob = load_checkpoint_config(ckpt_dir)
    if overrides:
        cfg_blob = {**cfg_blob, **{k: v for k, v in overrides.items() if v is not None}}
    fdbm = FDBM(FDBMConfig.from_dict(cfg_blob))
    state = fdbm.init_state(jax.random.PRNGKey(0))
    from fdbm_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    use_slot = slot if mgr.has(slot) else "last"
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    state = mgr.restore(use_slot, abstract)
    return fdbm, state


def load_model_from_torch_ckpt(ckpt_file: str, overrides: dict | None = None):
    """Import a reference Lightning checkpoint (see utils/torch_port.py)."""
    from fdbm_tpu.utils.torch_port import load_reference_checkpoint

    hp, params = load_reference_checkpoint(ckpt_file, use_ema=True)
    if overrides:
        hp = {**hp, **{k: v for k, v in overrides.items() if v is not None}}
    fdbm = FDBM(FDBMConfig.from_dict(hp))
    state = fdbm.init_state(jax.random.PRNGKey(0))
    state = state.replace(params=params, ema_params=params)
    print(f"imported reference checkpoint {ckpt_file} "
          f"(backbone={hp.get('backbone')})")
    return fdbm, state


def main():
    from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

    setup_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-C", "--config", required=True)
    ap.add_argument("--slot", default="last", help="checkpoint slot to load")
    ap.add_argument("--exact_shape", action="store_true",
                    help="compile the exact utterance length instead of "
                         "the default 64-frame bucket snap (bit-matches "
                         "the reference's bucketless path; each new "
                         "length pays a fresh unrolled-sampler compile)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = load_config(args.config, parse_cli_overrides(args.overrides))
    fdbm, state = load_model_from_ckpt(cfg["ckpt"], slot=args.slot, overrides=cfg)

    x_hat = enhance_single(
        fdbm, state.ema_params,
        noisy_file=cfg["noisy_file"],
        output_file=cfg["output_file"],
        sampler_type=cfg.get("sampler_type"),
        N=int(cfg.get("N", 30)),
        sampler_kwargs=cfg.get("sampler_kwargs") or {},
        exact_shape=args.exact_shape,
    )
    print(f"wrote {cfg['output_file']} ({len(x_hat)} samples)")


if __name__ == "__main__":
    main()
