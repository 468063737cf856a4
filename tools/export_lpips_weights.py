"""Export LPIPS trunk + linear-head weights to the npz format ops/lpips.py
loads (run ONCE on any machine with torchvision + internet; the training/
eval environment then needs no downloads).

  python tools/export_lpips_weights.py --out weights/ [--nets vgg alex]

Produces weights/lpips_vgg.npz and weights/lpips_alex.npz; point
ADGS_LPIPS_WEIGHTS at them (or keep the default weights/ path relative to
the working directory). Source weights match lpipsPyTorch/modules/
networks.py:12-96 (torchvision IMAGENET1K_V1 trunks) and the official
richzhang/PerceptualSimilarity v0.1 linear heads.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adgs_tpu.ops.lpips import export_weights_from_torch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights")
    ap.add_argument("--nets", nargs="+", default=["vgg", "alex"])
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for net in args.nets:
        path = os.path.join(args.out, f"lpips_{net}.npz")
        export_weights_from_torch(path, net)
        print("wrote", path)


if __name__ == "__main__":
    main()
