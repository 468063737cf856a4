#!/usr/bin/env python
"""nuScenes -> adgs_tpu scene converter (offline).

Capability parity with scripts/nuscene/nuscene.py: 3 front cameras
(FRONT_LEFT, FRONT, FRONT_RIGHT) over frames [first, last], K/R/T from the
calibrated sensors + ego poses, LiDAR sweeps to world with per-point
timestamps, every 4th frame validation, writes meta.npz + image/ +
points3d.ply in the reader contract (scene/dataset_readers.py:359-455).

Requires `nuscenes-devkit` (separate env, like the reference's converter
environments — README.md:25-77).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataroot")
    p.add_argument("dst")
    p.add_argument("scene_name", help="e.g. scene-0230")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--first_frame", type=int, default=10)
    p.add_argument("--last_frame", type=int, default=69)
    p.add_argument("--val_every", type=int, default=4)
    args = p.parse_args()

    try:
        from nuscenes.nuscenes import NuScenes
        from pyquaternion import Quaternion
    except ImportError:
        print("ERROR: nuscenes-devkit is required for this converter (run "
              "it in a dedicated environment, as the reference does for "
              "scripts/nuscene/nuscene.py).")
        sys.exit(1)

    from adgs_tpu.data.ply import store_point_cloud

    nusc = NuScenes(version=args.version, dataroot=args.dataroot,
                    verbose=False)
    scene = next(s for s in nusc.scene if s["name"] == args.scene_name)
    cams = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT"]
    os.makedirs(os.path.join(args.dst, "image"), exist_ok=True)

    Ks, Rs, Ts, stamps, is_val = [], [], [], [], []
    pcd, pcd_t = [], []
    tok = scene["first_sample_token"]
    fidx = 0
    out_idx = 0
    while tok:
        sample = nusc.get("sample", tok)
        tok = sample["next"]
        if fidx < args.first_frame or fidx > args.last_frame:
            fidx += 1
            continue
        fi = fidx - args.first_frame
        for cam in cams:
            sd = nusc.get("sample_data", sample["data"][cam])
            cal = nusc.get("calibrated_sensor",
                           sd["calibrated_sensor_token"])
            ego = nusc.get("ego_pose", sd["ego_pose_token"])
            K = np.array(cal["camera_intrinsic"])
            T_c2e = np.eye(4)
            T_c2e[:3, :3] = Quaternion(cal["rotation"]).rotation_matrix
            T_c2e[:3, 3] = cal["translation"]
            T_e2w = np.eye(4)
            T_e2w[:3, :3] = Quaternion(ego["rotation"]).rotation_matrix
            T_e2w[:3, 3] = ego["translation"]
            T_w2c = np.linalg.inv(T_e2w @ T_c2e)
            Ks.append(K)
            Rs.append(T_w2c[:3, :3])
            Ts.append(T_w2c[:3, 3])
            stamps.append(fi)
            is_val.append(fi % args.val_every == 0 and fi > 0)
            shutil.copyfile(
                os.path.join(args.dataroot, sd["filename"]),
                os.path.join(args.dst, "image", f"{out_idx:06d}.jpg"))
            out_idx += 1

        # lidar sweep to world
        sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        cal = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        ego = nusc.get("ego_pose", sd["ego_pose_token"])
        pts = np.fromfile(os.path.join(args.dataroot, sd["filename"]),
                          dtype=np.float32).reshape(-1, 5)[:, :3]
        T_l2e = np.eye(4)
        T_l2e[:3, :3] = Quaternion(cal["rotation"]).rotation_matrix
        T_l2e[:3, 3] = cal["translation"]
        T_e2w = np.eye(4)
        T_e2w[:3, :3] = Quaternion(ego["rotation"]).rotation_matrix
        T_e2w[:3, 3] = ego["translation"]
        M = T_e2w @ T_l2e
        pcd.append(pts @ M[:3, :3].T + M[:3, 3])
        pcd_t.append(np.full(len(pts), fi, np.float32))
        fidx += 1

    np.savez(os.path.join(args.dst, "meta.npz"),
             K=np.array(Ks), R=np.array(Rs), T=np.array(Ts),
             time_stamps=np.array(stamps, np.float64),
             is_val_list=np.array(is_val))
    pts = np.concatenate(pcd)
    rng = np.random.default_rng(0)
    store_point_cloud(os.path.join(args.dst, "points3d.ply"), pts,
                      rng.random((len(pts), 3)).astype(np.float32) * 255,
                      times=np.concatenate(pcd_t))
    print(f"{out_idx} images, {len(pts)} lidar points -> {args.dst}")


if __name__ == "__main__":
    main()
