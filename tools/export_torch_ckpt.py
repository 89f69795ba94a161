#!/usr/bin/env python
"""Export a checkpoint trained here to a reference-loadable PyTorch .ckpt.

    python tools/export_torch_ckpt.py <ckpt_dir_or_slot_dir> <out.ckpt> \
        [--slot best_pesq] [--raw-params]

Writes the reference's checkpoint layout (``state_dict`` with ``dnn.``
keys + ``hyper_parameters``, fdbm/model.py:69) so models trained in this
framework can be taken back to the reference ecosystem — the inverse of
the ``.ckpt`` import path in infer_single.py. Exports the EMA weights by
default (what the reference swaps in for inference, model.py:146-160);
``--raw-params`` exports the raw training weights instead.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="checkpoints dir (or a slot dir)")
    ap.add_argument("out", help="output .ckpt path")
    ap.add_argument("--slot", default="last")
    ap.add_argument("--raw-params", action="store_true",
                    help="export raw training weights instead of EMA")
    args = ap.parse_args()

    from infer_single import load_model_from_ckpt
    from fdbm_tpu.utils.torch_export import save_reference_checkpoint

    fdbm, state = load_model_from_ckpt(args.ckpt_dir, slot=args.slot)
    params = state.params if args.raw_params else state.ema_params
    import dataclasses

    hp = {k: v for k, v in dataclasses.asdict(fdbm.cfg).items()
          if isinstance(v, (int, float, str, bool, list, tuple))
          or v is None}
    save_reference_checkpoint(args.out, fdbm.cfg.backbone, params,
                              hyper_parameters=hp)
    print(f"exported {args.ckpt_dir} [{args.slot}]"
          f"{' (raw)' if args.raw_params else ' (EMA)'} -> {args.out}")


if __name__ == "__main__":
    main()
