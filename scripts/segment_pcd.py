#!/usr/bin/env python
"""Tag LiDAR points with object ids from the train-view semantic masks.

Rewrites the scene's `points3d.ply` / `points3d-NN.ply` in place with an
`obj` column: each train frame projects the cloud points that carry its
timestamp (and are still untagged) into the view and reads the object id
out of the frame's semantic mask with nearest align-corners sampling —
reference semantics scripts/segment_pcd.py:80-177.

  python scripts/segment_pcd.py <scene> [--split_mode nvs-75] [--cam N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from adgs_tpu.data.ply import (                             # noqa: E402
    fetch_point_cloud, store_point_cloud)
from adgs_tpu.geometry.scene_meta import load_scene_meta    # noqa: E402
from adgs_tpu.geometry.segment import tag_object_points     # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--split_mode", default="nvs-75")
    ap.add_argument("--cam", type=int, default=None)
    args = ap.parse_args()

    meta = load_scene_meta(args.path, args.split_mode, args.cam)
    suffix = (f"-{args.split_mode.split('-')[-1]}"
              if meta.dataset == "kitti" else "")
    ply_path = os.path.join(args.path, f"points3d{suffix}.ply")
    points, colors, times, _ = fetch_point_cloud(ply_path)

    train = np.where(~meta.is_val)[0]
    semantics = [np.load(meta.semantic_paths[i]).astype(np.float32)
                 for i in train]
    obj = tag_object_points(points, times, meta.fid[train],
                            meta.K[train], meta.R[train], meta.T[train],
                            semantics, verbose=True)
    store_point_cloud(ply_path, points, colors * 255.0, times, obj)
    print(f"rewrote {ply_path} with obj column")


if __name__ == "__main__":
    main()
