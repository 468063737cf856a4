#!/usr/bin/env python
"""Waymo Open Dataset -> adgs_tpu scene converter (offline).

Capability parity with scripts/waymo/waymo.py: reads a tfrecord segment via
waymo-open-dataset, extracts front-camera(s) images + K/R/T, per-frame
LiDAR point clouds with per-point timestamps, marks every 4th frame as
validation (StreetGS protocol), and writes cameras.npz + image/ +
points3d.ply in the reader contract (scene/dataset_readers.py:261-357).

Requires `waymo-open-dataset-tf` + tensorflow (separate env, like the
reference's converter environments — README.md:25-77).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("tfrecord")
    p.add_argument("dst")
    p.add_argument("--num_cam", type=int, default=1,
                   help="1=FRONT, 3=FRONT_LEFT+FRONT+FRONT_RIGHT")
    p.add_argument("--val_every", type=int, default=4)
    args = p.parse_args()

    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils
    except ImportError:
        print("ERROR: waymo-open-dataset + tensorflow are required for this "
              "converter (run it in a dedicated environment, as the "
              "reference does for scripts/waymo/waymo.py).")
        sys.exit(1)

    from adgs_tpu.data.ply import store_point_cloud
    from PIL import Image
    import io

    cam_names = ([dataset_pb2.CameraName.FRONT] if args.num_cam == 1 else
                 [dataset_pb2.CameraName.FRONT_LEFT,
                  dataset_pb2.CameraName.FRONT,
                  dataset_pb2.CameraName.FRONT_RIGHT])
    os.makedirs(os.path.join(args.dst, "image"), exist_ok=True)

    Ks, Rs, Ts, stamps, is_val = [], [], [], [], []
    pcd, pcd_t = [], []
    ds = tf.data.TFRecordDataset(args.tfrecord, compression_type="")
    fidx = 0
    for data in ds:
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        pose_v2w = np.array(frame.pose.transform).reshape(4, 4)
        for c_i, cam_name in enumerate(cam_names):
            calib = next(c for c in frame.context.camera_calibrations
                         if c.name == cam_name)
            img_msg = next(i for i in frame.images if i.name == cam_name)
            # intrinsics: [f_u, f_v, c_u, c_v, k1..]
            intr = np.array(calib.intrinsic)
            T_cam2v = np.array(calib.extrinsic.transform).reshape(4, 4)
            # waymo camera frame: x forward; convert to CV convention
            cv2waymo = np.array([[0, 0, 1, 0], [-1, 0, 0, 0],
                                 [0, -1, 0, 0], [0, 0, 0, 1.0]])
            T_w2cam = np.linalg.inv(pose_v2w @ T_cam2v @ cv2waymo)
            Ks.append([intr[0], intr[1], intr[2], intr[3]])
            Rs.append(T_w2cam[:3, :3])
            Ts.append(T_w2cam[:3, 3])
            stamps.append(fidx)
            is_val.append(fidx % args.val_every == 0 and fidx > 0)
            out = os.path.join(args.dst, "image",
                               f"{fidx * args.num_cam + c_i:06d}.png")
            Image.open(io.BytesIO(img_msg.image)).save(out)

        ri, cp, _ = frame_utils.parse_range_image_and_camera_projection(frame)
        pts, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, ri, cp, 0)
        pts_w = (np.concatenate(pts, axis=0) @ pose_v2w[:3, :3].T
                 + pose_v2w[:3, 3])
        pcd.append(pts_w)
        pcd_t.append(np.full(len(pts_w), fidx, np.float32))
        fidx += 1

    np.savez(os.path.join(args.dst, "cameras.npz"),
             K=np.array(Ks), R=np.array(Rs), T=np.array(Ts),
             time_stamps=np.array(stamps, np.float64),
             is_val_list=np.array(is_val))
    pts = np.concatenate(pcd)
    rng = np.random.default_rng(0)
    store_point_cloud(os.path.join(args.dst, "points3d.ply"), pts,
                      rng.random((len(pts), 3)).astype(np.float32) * 255,
                      times=np.concatenate(pcd_t))
    print(f"{fidx} frames, {len(pts)} lidar points -> {args.dst}")


if __name__ == "__main__":
    main()
