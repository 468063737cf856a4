#!/usr/bin/env python
"""KITTI-MOT -> adgs_tpu scene converter (offline, numpy-only).

Capability parity with scripts/kitti/kitti.py: OXTS mercator pose chain,
stereo cameras from the tracking calib (P2/P3 re-based to a shared pinhole
K), per-frame LiDAR sweeps colored by bilinear stereo image sampling and
transformed to the world frame with per-point timestamps, split-specific
init clouds, and poses.npz in the reader contract
(scene/dataset_readers.py:142-259).

  python scripts/convert_kitti.py <kitti_tracking_root> <out_root> 0001 \
      --first_frame 380 --last_frame 431 --use_color
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from adgs_tpu.data.ply import store_point_cloud  # noqa: E402


def rotation_from_rpy(roll, pitch, heading):
    sh, ch = np.sin(heading), np.cos(heading)
    sp, cp = np.sin(pitch), np.cos(pitch)
    sr, cr = np.sin(roll), np.cos(roll)
    rz = np.array([[ch, -sh, 0], [sh, ch, 0], [0, 0, 1]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return rz @ ry @ rx


def get_val_frames(num_frames, test_every=None, train_every=None):
    if train_every is None:
        return set(np.arange(test_every, num_frames, test_every))
    train = set(np.arange(0, num_frames, train_every))
    return (set(np.arange(num_frames)) - train) if train_every > 1 else train


def bilinear_sample(img: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """[H,W,3] image, [N,2] pixel coords -> [N,3] (align_corners grid_sample
    analog, numpy)."""
    H, W = img.shape[:2]
    x = np.clip(uv[:, 0], 0, W - 1)
    y = np.clip(uv[:, 1], 0, H - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("scene")
    p.add_argument("--part", default="training")
    p.add_argument("--first_frame", default=65, type=int)
    p.add_argument("--last_frame", default=120, type=int)
    p.add_argument("--downsample_ratio", "-r", default=1.0, type=float)
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    src, scene = args.src, args.scene
    dst = os.path.join(args.dst, scene)
    left_dir = os.path.join(src, "data_tracking_image_2", args.part,
                            "image_02", scene)
    right_dir = os.path.join(src, "data_tracking_image_3", args.part,
                             "image_03", scene)
    oxts_path = os.path.join(src, "data_tracking_oxts", args.part, "oxts",
                             scene + ".txt")
    calib_path = os.path.join(src, "data_tracking_calib", args.part, "calib",
                              scene + ".txt")
    velo_dir = os.path.join(src, "data_tracking_velodyne", args.part,
                            "velodyne", scene)
    for path in (left_dir, right_dir, oxts_path, calib_path, velo_dir):
        assert os.path.exists(path), f"Cannot find: {path}"
    os.makedirs(os.path.join(dst, "image"), exist_ok=True)

    calibs = []
    with open(calib_path) as f:
        for line in f.read().splitlines():
            calibs.append(np.array([float(v) for v in line.split()[1:]]))
    P2 = calibs[2].reshape(3, 4)
    P3 = calibs[3].reshape(3, 4)
    T_rect = np.eye(4)
    T_rect[:3, :3] = calibs[4].reshape(3, 3)
    T_velo2cam = np.concatenate([calibs[5].reshape(3, 4),
                                 [[0, 0, 0, 1.0]]], axis=0)
    T_imu2velo = np.concatenate([calibs[6].reshape(3, 4),
                                 [[0, 0, 0, 1.0]]], axis=0)
    T_imu2cam = T_rect @ T_velo2cam @ T_imu2velo

    focal = P2[0, 0]
    with Image.open(os.path.join(left_dir, sorted(os.listdir(left_dir))[0])) as im:
        W, H = im.size
    K = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1.0]])
    camrect_cam2 = np.linalg.inv(K) @ P2
    camrect_cam3 = np.linalg.inv(K) @ P3

    nf = args.last_frame - args.first_frame + 1
    splits = {"75": get_val_frames(nf, test_every=4),
              "50": get_val_frames(nf, test_every=2),
              "25": get_val_frames(nf, train_every=4)}
    pcds = {k: [] for k in splits}
    cols = {k: [] for k in splits}

    oxts = np.loadtxt(oxts_path)
    scale = np.cos(oxts[0][0] * np.pi / 180)
    rng = np.random.default_rng(args.seed)
    RT, time_stamp, rt_0 = [], [], None

    frames = sorted(os.listdir(left_dir))
    for idx, fname in enumerate(frames):
        if idx < args.first_frame or idx > args.last_frame:
            continue
        fi = idx - args.first_frame
        shutil.copyfile(os.path.join(left_dir, fname),
                        os.path.join(dst, "image", f"{2 * fi:06d}.png"))
        shutil.copyfile(os.path.join(right_dir, fname),
                        os.path.join(dst, "image", f"{2 * fi + 1:06d}.png"))

        o = oxts[idx]
        r_earth = 6378137.0
        x = scale * r_earth * (np.pi * o[1]) / 180
        y = scale * r_earth * np.log(np.tan((np.pi * (90 + o[0])) / 360))
        rt_inv = np.eye(4)
        rt_inv[:3] = np.concatenate(
            [rotation_from_rpy(o[3], o[4], o[5]),
             np.array([x, y, o[2]])[:, None]], axis=-1)
        if rt_0 is None:
            rt_0 = np.linalg.inv(rt_inv)
        rt_inv = rt_0 @ rt_inv
        rt = T_imu2cam @ np.linalg.inv(rt_inv)
        RT.append(camrect_cam2 @ rt)
        RT.append(camrect_cam3 @ rt)
        time_stamp += [fi, fi]

        vel = np.fromfile(os.path.join(velo_dir, f"{idx:06d}.bin"),
                          dtype=np.float32).reshape(-1, 4)
        vel[:, 3] = 1.0
        color = np.zeros((len(vel), 3), np.float32)
        masks = []
        for P, img_dir in ((P2, left_dir), (P3, right_dir)):
            proj = (P @ T_rect @ T_velo2cam @ vel.T).T
            m = proj[:, 2] > 0
            uv = proj[:, :2] / np.maximum(proj[:, 2:], 1e-9)
            m &= ((uv[:, 0] >= 0) & (uv[:, 0] <= W - 1)
                  & (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1))
            masks.append(m)
            if args.use_color:
                img = np.asarray(Image.open(
                    os.path.join(img_dir, fname)), np.float32) / 255.0
                color[m] += bilinear_sample(img, uv[m])
        mask = masks[0] | masks[1]
        denom = np.clip(masks[0].astype(np.float32)
                        + masks[1].astype(np.float32), 1, None)
        color = color / denom[:, None]

        pts = (rt_inv @ np.linalg.inv(T_imu2velo) @ vel[mask].T).T[:, :3]
        color = color[mask]
        if args.downsample_ratio < 1.0:
            keep = rng.permutation(len(pts))[
                : int(len(pts) * args.downsample_ratio)]
            pts, color = pts[keep], color[keep]
        if not args.use_color:
            color = rng.random((len(pts), 3)).astype(np.float32)
        rec = np.concatenate(
            [pts, np.full((len(pts), 1), fi, np.float32)], axis=-1)
        for k, i_test in splits.items():
            if fi not in i_test:
                pcds[k].append(rec)
                cols[k].append(color)

    RT = np.stack(RT)
    np.savez(os.path.join(dst, "poses.npz"),
             R=RT[:, :3, :3], T=RT[:, :3, 3], focal=focal,
             height=H, width=W,
             time_stamp=np.array(time_stamp, np.float64))
    for k in splits:
        pc = np.concatenate(pcds[k])
        cc = np.concatenate(cols[k])
        store_point_cloud(os.path.join(dst, f"points3d-{k}.ply"),
                          pc[:, :3], cc * 255.0, times=pc[:, 3])
        print(f"points3d-{k}.ply: {len(pc)} points")
    print("Images and poses:", RT.shape[0])


if __name__ == "__main__":
    main()
