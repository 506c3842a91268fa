#!/usr/bin/env python
"""Convert checkpoints between the reference (torch .pt) and this
framework's (.npz/orbax) formats.

Migration story for users switching from the reference
(noisy_src/train.py:236-304 save format) — trained runs carry over in both
directions:

    # reference .pt (file or run dir) -> our npz run dir; then train with
    # --resume <out_dir> or run `python -m noisy_src.inference --checkpoint`
    python scripts/convert_checkpoint.py to-tpu outputs/lego_clean/ /tmp/imported

    # one of OUR checkpoints -> a reference-loadable .pt
    python scripts/convert_checkpoint.py to-torch /tmp/run/ /tmp/export.pt

to-tpu imports the torch Adam moments into the optax state by default, so
a resumed run continues the reference's optimizer trajectory; pass
--fresh_optimizer to reinitialize them instead.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    imp = sub.add_parser("to-tpu", help="reference .pt -> our .npz run dir")
    imp.add_argument("src", help=".pt file or reference run dir "
                                 "(uses checkpoint_latest.pt)")
    imp.add_argument("dest", help="output run directory")
    imp.add_argument("--fresh_optimizer", action="store_true",
                     help="do not import torch Adam moments")
    imp.add_argument("--unsafe_load", action="store_true",
                     help="allow full unpickling if the safe torch loader "
                          "fails (only for checkpoints you trust)")
    imp.add_argument("--best", action="store_true",
                     help="also write checkpoint_best.npz")
    imp.add_argument("--backend", default="npz",
                     choices=("npz", "orbax", "orbax_async"))

    exp = sub.add_parser("to-torch", help="our checkpoint -> reference .pt")
    exp.add_argument("src", help=".npz/.orbax checkpoint or run dir "
                                 "(uses checkpoint_latest)")
    exp.add_argument("dest", help="output .pt path")

    args = p.parse_args()

    if args.cmd == "to-tpu":
        from robust_nerf_tpu.utils.torch_ckpt import (
            import_reference_checkpoint,
            save_imported_checkpoint,
        )

        state, cfg, meta = import_reference_checkpoint(
            args.src, unsafe=args.unsafe_load,
            import_optimizer=not args.fresh_optimizer,
        )
        kind = "pose-opt" if meta["extra_arrays"] else "standard"
        path = save_imported_checkpoint(
            args.dest, state, cfg, meta, is_best=args.best,
            backend=args.backend,
        )
        print(f"imported {kind} checkpoint @ iteration {meta['iteration']} "
              f"-> {path}")
    else:
        from robust_nerf_tpu.utils.torch_ckpt import (
            export_reference_checkpoint,
        )

        path = export_reference_checkpoint(args.src, args.dest)
        print(f"exported reference-format checkpoint -> {path}")


if __name__ == "__main__":
    main()
