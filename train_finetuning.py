#!/usr/bin/env python
"""Fine-tuning CLI: the "enhanced bridge" model (reference
train_finetuning.py) — load a pretrained bridge checkpoint, unroll its
ODE-EI sampler in training, predictive-style loss on the sampler output,
exp LR schedule.

    python train_finetuning.py -C configs/config_finetuning.yaml [key=value...]
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax

from fdbm_tpu.checkpoint import CheckpointManager, load_checkpoint_config
from fdbm_tpu.config import load_config, parse_cli_overrides
from fdbm_tpu.data import DataConfig
from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.train import Trainer


def main():
    # Multi-host runtime wiring (no-op on a single host): after this,
    # jax.devices() spans the pod and process_index()/process_count()
    # drive file sharding (reference DDP/rank semantics).
    from fdbm_tpu.parallel import initialize
    from fdbm_tpu.utils.compilation_cache import setup_compilation_cache

    initialize()
    setup_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-C", "--config", required=True)
    ap.add_argument("-D", "--devices", type=int, default=None)
    ap.add_argument("--slot", default="last")
    ap.add_argument("--max_steps", type=int, default=1_000_000)
    ap.add_argument("--max_epochs", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = load_config(args.config, parse_cli_overrides(args.overrides))

    # Rebuild the pretrained model config; the architecture / STFT / bridge
    # definition comes from the checkpoint. Only training-procedure fields
    # are overridden by the fine-tuning YAML (reference
    # train_finetuning.py:109-114 overrides N / batch / lr / scheduler).
    OVERRIDABLE = {
        "N", "batch_size", "lr", "scheduler_config", "loss_type", "l1_weight",
        "pesq_weight", "num_eval_files", "save_ckpt_interval", "base_dir",
        "log_dir", "version", "num_workers", "num_data_per_epoch", "dummy",
        "accumulate_grad_batches",
    }
    # The pretrain source may be a reference PyTorch-Lightning .ckpt FILE
    # (weights imported via utils/torch_port — migration path) or this
    # framework's checkpoint directory.
    if os.path.isfile(cfg["ckpt"]) and cfg["ckpt"].endswith(".ckpt"):
        from fdbm_tpu.utils.torch_port import load_reference_checkpoint

        pretrain_cfg, pre_params = load_reference_checkpoint(cfg["ckpt"])
        print(f"imported reference pretrain checkpoint {cfg['ckpt']}")
    else:
        pretrain_cfg = load_checkpoint_config(cfg["ckpt"])
        pre_params = None
    merged = {**pretrain_cfg,
              **{k: v for k, v in cfg.items()
                 if k in OVERRIDABLE and v is not None}}
    merged["mode"] = "finetuning"
    merged["sampler_type"] = "ode_ei"
    model_cfg = FDBMConfig.from_dict(merged)
    fdbm = FDBM(model_cfg)

    # Load pretrained params from the bridge checkpoint.
    if pre_params is None:
        state = fdbm.init_state(jax.random.PRNGKey(args.seed))
        mgr = CheckpointManager(cfg["ckpt"])
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        pre_state = mgr.restore(args.slot if mgr.has(args.slot) else "last",
                                abstract)
        pre_params = pre_state.ema_params

    data_fields = {f.name for f in DataConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    data_cfg = DataConfig(**{k: v for k, v in merged.items() if k in data_fields})

    version = cfg.get("version", "finetune")
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    log_dir = os.path.join(cfg.get("log_dir", "./logs"), f"{version}_{stamp}")

    trainer = Trainer(
        fdbm, data_cfg, log_dir,
        max_steps=args.max_steps,
        max_epochs=args.max_epochs,
        num_eval_files=int(merged.get("num_eval_files", 20)),
        save_ckpt_interval=int(merged.get("save_ckpt_interval", 20000)),
        n_devices=args.devices,
        seed=args.seed,
        config_blob=merged,
    )
    trainer.fit(resume=False, init_params=pre_params)


if __name__ == "__main__":
    main()
