"""Range-image lidar math + SDK-free nuScenes converter.

Covers adgs_tpu/data/lidar.py (the Waymo/nuScenes converter geometry,
reference scripts/waymo/waymo.py:85-305 and scripts/nuscene/nuscene.py)
against independently-derived expectations, and runs the nuScenes
converter end-to-end on a synthetic plain-JSON fixture.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from adgs_tpu.data import lidar

REPO = os.path.join(os.path.dirname(__file__), "..")


class TestRangeImage:
    def test_inclinations_are_pixel_centered_topdown(self):
        inc = lidar.beam_inclinations(-0.4, 0.2, 3)
        # pixel centers at 1/6, 3/6, 5/6 of [-0.4, 0.2], top row = max
        np.testing.assert_allclose(inc, [0.1, -0.1, -0.3], atol=1e-12)

    def test_azimuth_sweep_and_yaw_correction(self):
        az = lidar.azimuths(4, np.eye(4))
        # pixel-centered sweep from +pi to -pi: (2*(w-i-0.5)/w - 1) * pi
        want = np.array([0.75, 0.25, -0.25, -0.75]) * np.pi
        np.testing.assert_allclose(az, want, atol=1e-12)
        # a sensor yawed by phi sees the same world azimuth shifted by -phi
        phi = 0.3
        ext = np.eye(4)
        ext[:2, :2] = [[np.cos(phi), -np.sin(phi)],
                       [np.sin(phi), np.cos(phi)]]
        np.testing.assert_allclose(lidar.azimuths(4, ext), want - phi,
                                   atol=1e-12)

    def test_points_land_at_hand_computed_positions(self):
        """Every (row, col, range) maps to r * [cos i cos a, cos i sin a,
        sin i] in the sensor frame — derived here independently."""
        H, W = 4, 8
        rng = np.random.default_rng(0)
        ranges = rng.uniform(1.0, 10.0, (H, W)).astype(np.float32)
        inc = lidar.beam_inclinations(-0.3, 0.1, H)
        ext = np.eye(4)
        pts = lidar.range_image_to_points(ranges, ext, incl_min=-0.3,
                                          incl_max=0.1)
        k = 0
        for i in range(H):
            for j in range(W):
                a = (2.0 * (W - j - 0.5) / W - 1.0) * np.pi
                want = ranges[i, j] * np.array(
                    [np.cos(inc[i]) * np.cos(a),
                     np.cos(inc[i]) * np.sin(a), np.sin(inc[i])])
                np.testing.assert_allclose(pts[k], want, rtol=1e-5)
                k += 1

    def test_extrinsic_moves_points_to_vehicle_frame(self):
        H, W = 2, 4
        ranges = np.full((H, W), 5.0, np.float32)
        ext = np.eye(4)
        ext[:3, 3] = [1.0, 2.0, 3.0]
        base = lidar.range_image_to_points(ranges, np.eye(4),
                                           incl_min=-0.1, incl_max=0.1)
        moved = lidar.range_image_to_points(ranges, ext, incl_min=-0.1,
                                            incl_max=0.1)
        np.testing.assert_allclose(moved, base + [1, 2, 3], rtol=1e-5)

    def test_yawed_extrinsic_keeps_world_direction(self):
        """The azimuth yaw-correction exactly cancels the extrinsic yaw: a
        return at a given column lands in the same VEHICLE direction no
        matter how the sensor is spun around z."""
        H, W = 1, 8
        ranges = np.full((H, W), 3.0, np.float32)
        base = lidar.range_image_to_points(ranges, np.eye(4), incl_min=0.0,
                                           incl_max=0.0)
        phi = 1.1
        ext = np.eye(4)
        ext[:2, :2] = [[np.cos(phi), -np.sin(phi)],
                       [np.sin(phi), np.cos(phi)]]
        spun = lidar.range_image_to_points(ranges, ext, incl_min=0.0,
                                           incl_max=0.0)
        np.testing.assert_allclose(spun, base, atol=1e-6)

    def test_zero_range_pixels_are_dropped(self):
        ranges = np.array([[2.0, 0.0, 3.0, -1.0]], np.float32)
        pts = lidar.range_image_to_points(ranges, np.eye(4), incl_min=0.0,
                                          incl_max=0.0)
        assert pts.shape == (2, 3)

    def test_pixel_pose_chain(self):
        """points -> pixel-pose world -> frame_pose vehicle must equal
        inv(F) @ T @ p for constant per-pixel pose T."""
        H, W = 2, 4
        ranges = np.full((H, W), 4.0, np.float32)
        rng = np.random.default_rng(1)
        q = rng.normal(size=4)
        T = lidar.pose_rt(q, [0.5, -1.0, 2.0])
        F = lidar.pose_rt(rng.normal(size=4), [10.0, 0.0, -3.0])
        pix = np.broadcast_to(T, (H, W, 4, 4)).copy()
        base = lidar.range_image_to_points(ranges, np.eye(4), incl_min=-0.1,
                                           incl_max=0.1)
        out = lidar.range_image_to_points(
            ranges, np.eye(4), incl_min=-0.1, incl_max=0.1,
            pixel_pose=pix, frame_pose=F)
        want = (base @ T[:3, :3].T + T[:3, 3]) @ np.linalg.inv(
            F)[:3, :3].T + np.linalg.inv(F)[:3, 3]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_pixel_pose_matrices_rpy(self):
        """Rz(yaw)Ry(pitch)Rx(roll) composition + translation channels."""
        rpy = np.zeros((1, 1, 6))
        rpy[0, 0] = [0.1, -0.2, 0.3, 4.0, 5.0, 6.0]
        m = lidar.pixel_pose_matrices(rpy)[0, 0]

        def rx(a):
            return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                             [0, np.sin(a), np.cos(a)]])

        def ry(a):
            return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                             [-np.sin(a), 0, np.cos(a)]])

        def rz(a):
            return np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        np.testing.assert_allclose(m[:3, :3], rz(0.3) @ ry(-0.2) @ rx(0.1),
                                   atol=1e-12)
        np.testing.assert_allclose(m[:3, 3], [4, 5, 6])


class TestCameraChain:
    def test_forward_point_hits_optical_axis(self):
        """Vehicle +x is the camera look direction after the OpenCV flip."""
        RT = lidar.camera_world_to_cam(np.eye(4), np.eye(4))
        p = np.array([[7.0, 0.0, 0.0]])
        cam = p @ RT[:3, :3].T + RT[:3, 3]
        np.testing.assert_allclose(cam, [[0.0, 0.0, 7.0]], atol=1e-12)
        # vehicle +y (left) -> image -x; vehicle +z (up) -> image -y
        cam2 = np.array([[5.0, 1.0, 2.0]]) @ RT[:3, :3].T + RT[:3, 3]
        np.testing.assert_allclose(cam2, [[-1.0, -2.0, 5.0]], atol=1e-12)

    def test_project_points_mask(self):
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        RT = np.eye(4)[:3]
        pts = np.array([[0.0, 0.0, 5.0],      # center
                        [0.0, 0.0, -5.0],     # behind
                        [10.0, 0.0, 5.0]])    # off image
        uv, depth, mask = lidar.project_points(pts, K, RT[:3], 64, 48)
        assert mask.tolist() == [True, False, False]
        np.testing.assert_allclose(uv[0], [32, 24])
        np.testing.assert_allclose(depth[0], 5.0)

    def test_color_sampling_matches_torch_grid_sample(self, rng):
        torch = pytest.importorskip("torch")
        H, W = 37, 53
        img = rng.uniform(size=(H, W, 3)).astype(np.float32)
        uv = np.stack([rng.uniform(0, W - 1, 200),
                       rng.uniform(0, H - 1, 200)], -1)
        ours = lidar.sample_colors_aligned(img, uv)
        g = torch.tensor(np.stack([uv[:, 0] / W * 2 - 1,
                                   uv[:, 1] / H * 2 - 1], -1),
                         dtype=torch.float32)
        ref = torch.nn.functional.grid_sample(
            torch.tensor(img).permute(2, 0, 1)[None], g[None, None],
            align_corners=True).squeeze().permute(1, 0).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_depth_map(self):
        uv = np.array([[10.2, 5.4], [10.2, 5.4], [0.0, 0.0]])
        depth = np.array([3.0, 7.0, 1.0])
        mask = np.array([True, True, False])
        dmap, dmask = lidar.lidar_depth_map(uv, depth, mask, 16, 8)
        assert dmap[5, 10] == 7.0          # later write wins (ref order)
        assert dmask[5, 10] and not dmask[0, 0]
        assert dmask.sum() == 1


class TestQuatPose:
    def test_quat_identity_and_axis(self):
        np.testing.assert_allclose(lidar.quat_to_rotation([1, 0, 0, 0]),
                                   np.eye(3), atol=1e-12)
        # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
        R = lidar.quat_to_rotation([np.cos(np.pi / 4), 0, 0,
                                    np.sin(np.pi / 4)])
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    def test_unnormalized_quat(self):
        R1 = lidar.quat_to_rotation([2, 0, 0, 0])
        np.testing.assert_allclose(R1, np.eye(3), atol=1e-12)

    def test_nearest_by_timestamp(self):
        ts = np.array([0.0, 10.0, 20.0, 30.0])
        assert lidar.nearest_by_timestamp(ts, 12.0) == 1
        assert lidar.nearest_by_timestamp(ts, 16.0) == 2

    def test_val_frames(self):
        assert lidar.get_val_frames(10, test_every=4) == {4, 8}


# ---------------------------------------------------------------------------
# SDK-free nuScenes converter end-to-end
# ---------------------------------------------------------------------------

def make_nuscenes_fixture(root, rng, n_frames=8):
    """Minimal plain-JSON nuScenes layout: one scene, 3 front cameras at
    '12Hz', lidar at '20Hz', points on a ground plane z=0 in GLOBAL frame
    (ego moves along +x)."""
    from PIL import Image
    version = "v1.0-mini"
    os.makedirs(os.path.join(root, version), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)

    sensors, calib, ego, sdata, samples = [], [], [], [], []
    sensors.append({"token": "sens_lidar", "channel": "LIDAR_TOP",
                    "modality": "lidar"})
    calib.append({"token": "cs_lidar", "sensor_token": "sens_lidar",
                  "rotation": [1, 0, 0, 0], "translation": [0, 0, 1.8],
                  "camera_intrinsic": []})
    cams = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT"]
    Kmat = [[30.0, 0, 32], [0, 30.0, 24], [0, 0, 1]]
    for ci, c in enumerate(cams):
        sensors.append({"token": f"sens_{c}", "channel": c,
                        "modality": "camera"})
        # camera z forward = vehicle +x (OpenCV-style extrinsic quat):
        # R = Rz(-90) * Rx(-90) maps cam axes into vehicle axes
        calib.append({"token": f"cs_{c}", "sensor_token": f"sens_{c}",
                      "rotation": [0.5, -0.5, 0.5, -0.5],
                      "translation": [1.5, 0.2 * ci, 1.6],
                      "camera_intrinsic": Kmat})

    W, H = 64, 48
    img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)

    sample_tokens = [f"samp{f}" for f in range(n_frames)]
    for f in range(n_frames):
        samples.append({
            "token": sample_tokens[f],
            "next": sample_tokens[f + 1] if f + 1 < n_frames else "",
            "prev": sample_tokens[f - 1] if f > 0 else "",
            "scene_token": "scene0",
            "data": {},   # devkit-only convenience; converter ignores it
        })

    for f in range(n_frames):
        t_us = 1_000_000 + f * 100_000
        # ego at x = 2f, identity orientation
        ego.append({"token": f"ego_l{f}", "timestamp": t_us,
                    "rotation": [1, 0, 0, 0], "translation": [2.0 * f, 0, 0]})
        # lidar sweep: ring of points on global ground plane around ego ->
        # in LIDAR frame: subtract ego x, then z -> -1.8
        ang = rng.uniform(0, 2 * np.pi, 300)
        rad = rng.uniform(3.0, 12.0, 300)
        gx = 2.0 * f + rad * np.cos(ang)
        gy = rad * np.sin(ang)
        pts_lidar = np.stack(
            [gx - 2.0 * f, gy, np.full(300, -1.8), np.ones(300),
             np.zeros(300)], -1).astype(np.float32)
        rel = f"sweeps/lidar_{f}.bin"
        pts_lidar.tofile(os.path.join(root, rel))
        sdata.append({
            "token": f"sd_l{f}", "sample_token": sample_tokens[f],
            "ego_pose_token": f"ego_l{f}",
            "calibrated_sensor_token": "cs_lidar",
            "timestamp": t_us, "filename": rel, "is_key_frame": True,
            "height": 0, "width": 0,
            "next": f"sd_l{f + 1}" if f + 1 < n_frames else "", "prev": ""})
        for c in cams:
            ego.append({"token": f"ego_{c}{f}", "timestamp": t_us + 7,
                        "rotation": [1, 0, 0, 0],
                        "translation": [2.0 * f, 0, 0]})
            rel = f"samples/{c}_{f}.png"
            Image.fromarray(img).save(os.path.join(root, rel))
            sdata.append({
                "token": f"sd_{c}{f}", "sample_token": sample_tokens[f],
                "ego_pose_token": f"ego_{c}{f}",
                "calibrated_sensor_token": f"cs_{c}",
                "timestamp": t_us + 7, "filename": rel,
                "is_key_frame": True, "height": H, "width": W,
                "next": f"sd_{c}{f + 1}" if f + 1 < n_frames else "",
                "prev": ""})

    tables = {
        "scene": [{"token": "scene0", "name": "scene-0001",
                   "first_sample_token": sample_tokens[0]}],
        "sample": samples, "sample_data": sdata, "ego_pose": ego,
        "calibrated_sensor": calib, "sensor": sensors,
    }
    for name, rows in tables.items():
        with open(os.path.join(root, version, name + ".json"), "w") as fp:
            json.dump(rows, fp)
    return root


def test_nuscenes_converter_end_to_end(tmp_path, rng):
    root = make_nuscenes_fixture(str(tmp_path / "nusc"), rng)
    dst_root = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "convert_nuscenes.py"),
         root, dst_root, "scene-0001", "--version", "v1.0-mini",
         "--first_frame", "0", "--last_frame", "7", "--use_color",
         "--use_depth"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    dst = os.path.join(dst_root, "scene-0001")

    meta = np.load(os.path.join(dst, "meta.npz"))
    assert meta["R"].shape == (24, 3, 3)      # 8 frames x 3 cams
    assert meta["K"].shape == (24, 3, 3)
    # frames 4 (and every 4th) are val
    assert list(meta["is_val_list"][:3 * 3]) == [False] * 9
    assert all(meta["is_val_list"][12:15])

    from adgs_tpu.data.ply import fetch_point_cloud
    xyz, rgb, t, _ = fetch_point_cloud(os.path.join(dst, "points3d.ply"))
    assert len(xyz) > 100
    # the ground plane sits at z = -1.8 in the REBASED frame (ego0 at z=0,
    # global ground z=0 -> unchanged by identity-orientation rebase)
    assert np.all(np.abs(xyz[:, 2] - 0.0) < 1e-3)
    # only train-frame timestamps contribute points
    assert set(np.unique(t).tolist()).isdisjoint({4.0})

    # CAM_FRONT at frame 0 looks along vehicle +x: a rebased-world point
    # ahead of the camera must project inside the image with z > 0
    R0, T0, K0 = meta["R"][0], meta["T"][0], meta["K"][0]
    p = np.array([[10.0, 0.0, 1.6]])
    cam = p @ R0.T + T0
    assert cam[0, 2] > 0
    uv = (cam @ K0.T)
    uv = uv[:, :2] / uv[:, 2:]
    assert 0 <= uv[0, 0] <= 63 and 0 <= uv[0, 1] <= 47

    # depth maps exist and carry the lidar ring depths
    d = np.load(os.path.join(dst, "lidar_depth", "000000.npz"))
    assert d["mask"].any()
    assert (d["depth"][d["mask"]] > 0).all()
