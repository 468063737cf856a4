#!/usr/bin/env python
"""Convert a reference AD-GS checkpoint into adgs_tpu format (and back).

The PLY layouts already match property-for-property
(construct_list_of_attributes, scene/gaussian_model.py:413-426); the only
difference is the deformation sidecar: the reference stores a torch pickle
`deform.pth` (gaussian_model.py:448-459), we store `deform.npz`. This tool
bridges the two (torch is required only for reading/writing .pth):

  # reference -> adgs_tpu (writes deform.npz next to point_cloud.ply)
  python tools/convert_reference_ckpt.py import <iteration_dir>

  # adgs_tpu -> reference (writes deform.pth from deform.npz)
  python tools/convert_reference_ckpt.py export <iteration_dir>
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def do_import(d: str) -> None:
    import torch
    (xyz_deform, rotation_deform, shs_scene, shs_obj, background_deform,
     gs_time, gs_time_sigma, use_time_mask, order_args, scene_extent) = \
        torch.load(os.path.join(d, "deform.pth"), map_location="cpu",
                   weights_only=False)
    np.savez(
        os.path.join(d, "deform.npz"),
        xyz_deform=xyz_deform.detach().numpy(),
        rotation_deform=rotation_deform.detach().numpy(),
        shs_deform_scene=shs_scene.detach().numpy(),
        shs_deform_obj=shs_obj.detach().numpy(),
        background_deform=background_deform.detach().numpy(),
        gs_time=np.asarray(gs_time.detach().numpy()).reshape(-1),
        gs_time_sigma=gs_time_sigma.detach().numpy(),
        use_time_mask=np.asarray(bool(use_time_mask)),
        order_args=np.asarray(json.dumps(
            {k: list(v) for k, v in order_args.items()})),
    )
    print("wrote", os.path.join(d, "deform.npz"),
          f"(scene_extent={scene_extent})")


def do_export(d: str) -> None:
    import torch
    z = np.load(os.path.join(d, "deform.npz"), allow_pickle=True)
    order = json.loads(str(z["order_args"]))
    gs_time = torch.tensor(z["gs_time"]).reshape(-1, 1)
    payload = (
        torch.nn.Parameter(torch.tensor(z["xyz_deform"])),
        torch.nn.Parameter(torch.tensor(z["rotation_deform"])),
        torch.nn.Parameter(torch.tensor(z["shs_deform_scene"])),
        torch.nn.Parameter(torch.tensor(z["shs_deform_obj"])),
        torch.nn.Parameter(torch.tensor(z["background_deform"])),
        gs_time,
        torch.nn.Parameter(torch.tensor(z["gs_time_sigma"])),
        bool(z["use_time_mask"]),
        {k: list(v) for k, v in order.items()},
        float(z.get("scene_extent", 100.0)),
    )
    torch.save(payload, os.path.join(d, "deform.pth"))
    print("wrote", os.path.join(d, "deform.pth"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["import", "export"])
    p.add_argument("iteration_dir")
    args = p.parse_args()
    (do_import if args.mode == "import" else do_export)(args.iteration_dir)


if __name__ == "__main__":
    main()
