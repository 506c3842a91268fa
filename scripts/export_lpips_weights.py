"""Export the torch `lpips` VGG16 checkpoint to the JAX weights archive.

Run this ONCE in any environment that has `torch`, `torchvision`, and
`lpips` installed (this container has no egress, so it cannot download the
pretrained weights itself):

    python scripts/export_lpips_weights.py --out weights/lpips_vgg.npz

Copy the resulting .npz into the repo's weights/ directory (or point
$LPIPS_WEIGHTS at it) and LPIPSMetric.available flips to True with the
pure-JAX forward (evalx/lpips_jax.py) — no torch needed at eval time.

Schema produced (consumed by evalx/lpips_jax.py):
  shift/scale (1,3,1,1); conv{stage}_{idx}_w/b for VGG16's five conv
  stages (torchvision features indices [0:4],[4:9],[9:16],[16:23],[23:30]);
  lin{stage}_w = lpips learned 1x1 weights.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# torchvision VGG16 `features` conv indices per stage (maxpools between)
VGG16_STAGES = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--out", type=Path, default=Path("weights/lpips_vgg.npz"))
    args = p.parse_args(argv)

    import lpips
    import torch

    model = lpips.LPIPS(net="vgg")
    model.eval()

    out = {}
    scaler = model.scaling_layer
    out["shift"] = scaler.shift.detach().numpy().astype(np.float32)
    out["scale"] = scaler.scale.detach().numpy().astype(np.float32)

    features = model.net.slice1  # slices share the underlying vgg features
    vgg = torch.nn.Sequential(
        *(list(model.net.slice1) + list(model.net.slice2)
          + list(model.net.slice3) + list(model.net.slice4)
          + list(model.net.slice5))
    )
    conv_layers = [m for m in vgg if isinstance(m, torch.nn.Conv2d)]
    it = iter(conv_layers)
    for s, stage in enumerate(VGG16_STAGES):
        for i, _ in enumerate(stage):
            conv = next(it)
            out[f"conv{s}_{i}_w"] = conv.weight.detach().numpy().astype(np.float32)
            out[f"conv{s}_{i}_b"] = conv.bias.detach().numpy().astype(np.float32)

    for s, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy().astype(np.float32)
        out[f"lin{s}_w"] = w.reshape(1, -1, 1, 1)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({sum(v.size for v in out.values()):,} params)")
    del features


if __name__ == "__main__":
    main()
