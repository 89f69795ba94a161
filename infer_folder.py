#!/usr/bin/env python
"""Folder inference CLI (reference infer_folder.py): padded-bucket batched
TPU enhancement of every wav/flac under test_dir.

    python infer_folder.py -C configs/config_infer_folder.yaml [key=value...]

Multi-chip/multi-host scale-out is per-process file sharding
(jax.process_index/process_count), matching the reference's
process-per-GPU strategy without any inter-device communication.
"""

from __future__ import annotations

import argparse
import json

from fdbm_tpu.config import load_config, parse_cli_overrides
from fdbm_tpu.infer import enhance_folder
from infer_single import load_model_from_ckpt


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
    ap.add_argument("--slot", default="last")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--mesh_devices", type=int, default=0,
                    help="shard each batch over this many local chips "
                         "(single-controller multi-chip serving; 0 = one "
                         "chip per batch, files still shard per process)")
    ap.add_argument("--chunk_seconds", type=float, default=4.096,
                    help="sweet-spot pooled chunk serving: utterances "
                         "longer than ~this split into equal cross-faded "
                         "chunks batched at the efficiency peak (default "
                         "= the 4.096 s training crop). 0 = whole-"
                         "utterance serving (reference semantics)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = load_config(args.config, parse_cli_overrides(args.overrides))
    fdbm, state = load_model_from_ckpt(cfg["ckpt"], slot=args.slot, overrides=cfg)

    mesh = None
    if args.mesh_devices:
        from fdbm_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)

    stats = enhance_folder(
        fdbm, state.ema_params,
        test_dir=cfg["test_dir"],
        enhanced_dir=cfg["enhanced_dir"],
        sampler_type=cfg.get("sampler_type"),
        N=int(cfg.get("N", 30)),
        batch_size=args.batch_size,
        keep_structure=bool(cfg.get("keep_structure", True)),
        sampler_kwargs=cfg.get("sampler_kwargs") or {},
        mesh=mesh,
        chunk_seconds=args.chunk_seconds or None,
    )
    print(json.dumps({
        "files": stats.files,
        "failures": stats.failures,
        "audio_seconds": round(stats.audio_seconds, 2),
        "wall_seconds": round(stats.wall_seconds, 2),
        "audio_sec_per_sec": round(stats.throughput, 3),
    }))


if __name__ == "__main__":
    main()
