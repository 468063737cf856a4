"""Waymo / nuScenes format reader tests on synthetic fixtures."""

import os

import numpy as np
import pytest
from PIL import Image

from adgs_tpu.data import ply as ply_lib
from adgs_tpu.data.readers import read_scene


def _write_common(root, n_frames, num_cam, width, height, rng):
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    for d in ["depth", "semantic", "sky", "flow"]:
        os.makedirs(os.path.join(root, d), exist_ok=True)
    total = n_frames * num_cam
    for i in range(total):
        name = f"{i:06d}"
        img = (rng.uniform(size=(height, width, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "image", name + ".jpg"))
        np.save(os.path.join(root, "depth", name + ".npy"),
                rng.uniform(0.1, 1, (height, width)).astype(np.float32))
        np.save(os.path.join(root, "semantic", "mask_" + name + ".npy"),
                (rng.random((height, width)) < 0.2).astype(np.int32))
        np.save(os.path.join(root, "sky", "mask_" + name + ".npy"),
                (rng.random((height, width)) < 0.3).astype(np.uint8))
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    cols = (rng.uniform(size=(200, 3)) * 255).astype(np.float32)
    obj = (rng.random(200) < 0.4).astype(np.float32)
    tms = rng.uniform(0, n_frames - 1, 200).astype(np.float32)
    ply_lib.store_point_cloud(os.path.join(root, "points3d.ply"),
                              pts, cols, tms, obj)
    return total


def make_waymo_scene(root, n_frames=6, width=96, height=64, seed=0):
    rng = np.random.default_rng(seed)
    total = _write_common(root, n_frames, 1, width, height, rng)
    # waymo K layout: [fx, fy, cx, cy] (dataset_readers.py:286-287)
    K = np.tile(np.array([80.0, 80.0, width / 2, height / 2]), (total, 1))
    R = np.tile(np.eye(3), (total, 1, 1))
    T = np.zeros((total, 3))
    T[:, 2] = 4.0
    is_val = np.zeros(total, bool)
    is_val[3] = True
    np.savez(os.path.join(root, "cameras.npz"), K=K, R=R, T=T,
             time_stamps=np.arange(total, dtype=np.float64),
             is_val_list=is_val)
    return root


def make_nuscenes_scene(root, n_frames=4, num_cam=3, width=96, height=64,
                        seed=0):
    rng = np.random.default_rng(seed)
    total = _write_common(root, n_frames, num_cam, width, height, rng)
    # nuscenes K layout: full 3x3 (dataset_readers.py:389-390)
    K = np.tile(np.array([[80.0, 0, width / 2], [0, 80.0, height / 2],
                          [0, 0, 1.0]]), (total, 1, 1))
    R = np.tile(np.eye(3), (total, 1, 1))
    T = np.zeros((total, 3))
    T[:, 2] = 4.0
    is_val = np.zeros(total, bool)
    is_val[num_cam:2 * num_cam] = True
    np.savez(os.path.join(root, "meta.npz"), K=K, R=R, T=T,
             time_stamps=np.repeat(np.arange(n_frames), num_cam)
             .astype(np.float64), is_val_list=is_val)
    return root


def test_waymo_reader(tmp_path):
    root = make_waymo_scene(str(tmp_path / "waymo"))
    scene = read_scene(root, use_colmap=False)
    assert len(scene.test_frames) == 1
    assert len(scene.train_frames) == 5
    fr = scene.train_frames[0]
    assert fr.width == 96 and fr.height == 64
    assert abs(fr.fovx - 2 * np.arctan(48 / 80.0)) < 1e-6
    assert 0.0 <= fr.time <= 1.0
    # waymo keeps 30% of object points
    assert (scene.obj_id > 0.5).sum() > 0


def test_nuscenes_reader(tmp_path):
    root = make_nuscenes_scene(str(tmp_path / "nusc"))
    scene = read_scene(root, use_colmap=False)
    assert len(scene.test_frames) == 3
    assert len(scene.train_frames) == 9
    assert scene.frame_gap == pytest.approx(3 / 12)
    assert {f.cam_id for f in scene.train_frames} == {0, 1, 2}
