"""ONE-TIME golden-pack generation — run on a GPU machine with the
reference checkout (JiaweiXu8/AD-GS + its depth-diff-gaussian-rasterization
submodule built for CUDA). This script has NO adgs_tpu dependencies beyond
tools/golden_pack.py; copy the two files next to the reference repo:

    python make_golden_pack.py --out <adgs_tpu>/tests/golden

It synthesizes the deterministic cases (golden_pack.DEFAULT_CASES), runs
the reference rasterizer forward + backward with the stored cotangents,
and writes case_*.npz in the frozen schema. Commit the npz files; then
`python tools/parity_check.py` (and tests/test_golden_pack.py) replay them
through adgs_tpu on every backend.

Reference call mapping (diff_gaussian_rasterization/__init__.py:207-251):
  means2D: a zeros leaf with requires_grad — its grad is g_means2d;
  forward returns (color, radii, depth, opacity, flow, semantic);
  loss = sum(color * d_color) + sum(depth * d_depth).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from golden_pack import DEFAULT_CASES, save_case, synth_case  # noqa: E402


def run_reference(case: dict) -> dict:
    import torch
    from diff_gaussian_rasterization import (
        GaussianRasterizationSettings, GaussianRasterizer)

    dev = "cuda"
    t = lambda k: torch.tensor(np.asarray(case[k]), device=dev)  # noqa: E731
    settings = GaussianRasterizationSettings(
        image_height=int(case["image_height"]),
        image_width=int(case["image_width"]),
        tanfovx=float(case["tanfovx"]), tanfovy=float(case["tanfovy"]),
        bg=t("bg"), scale_modifier=float(case["scale_modifier"]),
        viewmatrix=t("viewmatrix"), projmatrix=t("projmatrix"),
        sh_degree=int(case["sh_degree"]), campos=t("campos"),
        prefiltered=False, inv_depth=bool(case["inv_depth"]), debug=False)

    leaves = {k: t(k).requires_grad_(True)
              for k in ("means3d", "scales", "rotations", "shs")}
    opac = t("opacities")[:, None].requires_grad_(True)
    means2d = torch.zeros_like(leaves["means3d"], requires_grad=True)
    flow = t("flow_points") if "flow_points" in case else None
    sem = t("semantic") if "semantic" in case else None

    rast = GaussianRasterizer(settings)
    color, radii, depth, opacity, img_flow, img_semantic = rast(
        means3D=leaves["means3d"], means2D=means2d, opacities=opac,
        shs=leaves["shs"], scales=leaves["scales"],
        rotations=leaves["rotations"], flow_points=flow, semantic=sem)

    loss = (color * t("d_color")).sum() + (depth * t("d_depth")).sum()
    loss.backward()

    out = dict(case)
    out["out_color"] = color.detach().cpu().numpy()
    out["out_depth"] = depth.detach().cpu().numpy()
    out["out_opacity"] = opacity.detach().cpu().numpy()
    out["out_radii"] = radii.detach().cpu().numpy().astype(np.int32)
    if flow is not None:
        out["out_flow"] = img_flow.detach().cpu().numpy()
    if sem is not None:
        out["out_semantic"] = img_semantic.detach().cpu().numpy()
    out["g_means3d"] = leaves["means3d"].grad.cpu().numpy()
    out["g_means2d"] = means2d.grad.cpu().numpy()
    out["g_opacities"] = opac.grad.cpu().numpy()[:, 0]
    out["g_scales"] = leaves["scales"].grad.cpu().numpy()
    out["g_rotations"] = leaves["rotations"].grad.cpu().numpy()
    out["g_shs"] = leaves["shs"].grad.cpu().numpy()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for i, kw in enumerate(DEFAULT_CASES):
        case = run_reference(synth_case(**kw))
        p = os.path.join(args.out, f"case_{i:02d}.npz")
        save_case(p, case)
        print(f"wrote {p}  (N={len(case['means3d'])}, "
              f"H={int(case['image_height'])}, W={int(case['image_width'])})")


if __name__ == "__main__":
    main()
