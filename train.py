#!/usr/bin/env python
"""Training CLI: generative bridge or predictive model.

Usage (mirrors the reference CLI surface, reference train.py):

    python train.py -C configs/config.yaml [key=value ...]

Device selection is automatic (all visible TPU/CPU devices form the data
mesh); `-D/--devices` limits the count.  Every YAML key can be overridden
with `key=value` (e.g. `batch_size=16 N=30`).
"""

from __future__ import annotations

import argparse
import datetime
import os

from fdbm_tpu.config import load_config, parse_cli_overrides
from fdbm_tpu.data import DataConfig
from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.train import Trainer


def build_from_config(cfg: dict):
    model_cfg = FDBMConfig.from_dict(cfg)
    fdbm = FDBM(model_cfg)
    data_fields = {f.name for f in DataConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    data_cfg = DataConfig(**{k: v for k, v in cfg.items() if k in data_fields})
    return fdbm, data_cfg


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
    ap.add_argument("-D", "--devices", type=int, default=None,
                    help="number of devices for the data mesh (default: all)")
    ap.add_argument("--ckpt", default=None,
                    help="warm-start from an external run/checkpoint dir "
                         "(reference --ckpt -> trainer.fit(ckpt_path))")
    ap.add_argument("--resume", default=None, metavar="LOG_DIR",
                    help="reuse this existing run dir and continue from its "
                         "'last' checkpoint (step counter continues)")
    ap.add_argument("--profile_steps", type=int, nargs=2, default=None,
                    metavar=("START", "END"),
                    help="jax.profiler trace window (train steps)")
    ap.add_argument("--max_steps", type=int, default=1_000_000)
    ap.add_argument("--max_epochs", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nolog", action="store_true")
    ap.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = ap.parse_args()

    cfg = load_config(args.config, parse_cli_overrides(args.overrides))

    if args.resume:
        # Reuse the run dir as-is: logger appends, checkpoints continue.
        log_dir = args.resume
        if not os.path.isdir(os.path.join(log_dir, "checkpoints")):
            raise SystemExit(
                f"--resume {log_dir}: no checkpoints/ dir found "
                f"(expected an existing run directory)")
    else:
        version = cfg.get("version", "run")
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        log_dir = os.path.join(cfg.get("log_dir", "./logs"), f"{version}_{stamp}")

    fdbm, data_cfg = build_from_config(cfg)
    trainer = Trainer(
        fdbm, data_cfg, log_dir,
        max_steps=args.max_steps,
        max_epochs=args.max_epochs,
        num_eval_files=int(cfg.get("num_eval_files", 20)),
        save_ckpt_interval=int(cfg.get("save_ckpt_interval", 20000)),
        n_devices=args.devices,
        seed=args.seed,
        config_blob=cfg,
        snapshot=not args.nolog,
        profile_steps=tuple(args.profile_steps) if args.profile_steps else None,
    )
    ckpt = args.ckpt or cfg.get("ckpt")
    # accept either a run dir or its checkpoints/ subdir
    if ckpt and os.path.isdir(os.path.join(ckpt, "checkpoints")):
        ckpt = os.path.join(ckpt, "checkpoints")
    trainer.fit(resume=bool(args.resume), resume_from=ckpt)


if __name__ == "__main__":
    main()
