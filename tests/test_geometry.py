"""Offline geometry pipeline: known-pose triangulation + point tagging.

Covers the native replacements for the reference's scripts/colmap.py
(point_triangulator with fixed poses) and scripts/segment_pcd.py
(mask->LiDAR object tagging): DLT correctness against ground-truth 3D
points, the COLMAP-flag-equivalent filters, union-find track building,
grid-sample parity against torch, and the scene-level CLI contracts."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adgs_tpu.geometry import segment as seg
from adgs_tpu.geometry import triangulate as tri
from adgs_tpu.geometry.scene_meta import load_scene_meta


def lookat_cameras(n_cams, radius=6.0, rng=None):
    """World-to-camera (R, T) ring looking at the origin."""
    Rs, Ts = [], []
    for i in range(n_cams):
        ang = 0.25 * i
        c = np.array([radius * np.sin(ang), 0.3 * i,
                      -radius * np.cos(ang)])
        fwd = -c / np.linalg.norm(c)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        Rw2c = np.stack([right, up, fwd])     # rows = camera axes
        Rs.append(Rw2c)
        Ts.append(-Rw2c @ c)
    return np.stack(Rs), np.stack(Ts)


def project(K, R, T, X):
    uvw = (K @ (R @ X.T + T[:, None])).T
    return uvw[:, :2] / uvw[:, 2:], uvw[:, 2]


def make_obs(points, K, Rs, Ts, noise=0.0, rng=None):
    """Perfect multi-view observations: every point seen in every frame."""
    F = len(Rs)
    N = len(points)
    xys, frames = [], []
    for f in range(F):
        uv, _ = project(K, Rs[f], Ts[f], points)
        if noise and rng is not None:
            uv = uv + rng.normal(scale=noise, size=uv.shape)
        xys.append(uv.astype(np.float32))
        frames.append(np.full(N, f))
    offset = np.arange(F + 1) * N
    obs = tri.Observations(
        xy=np.concatenate(xys), frame=np.concatenate(frames),
        offset=offset.astype(np.int64),
        color=np.zeros((F * N, 3), np.uint8))
    track_of = np.tile(np.arange(N), F).astype(np.int64)
    return obs, tri.Tracks(track_of=track_of, n_tracks=N)


class TestTriangulation:
    def test_dlt_recovers_points(self, rng):
        pts = rng.uniform(-1.5, 1.5, size=(60, 3))
        K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
        Rs, Ts = lookat_cameras(4)
        obs, tracks = make_obs(pts, K, Rs, Ts)
        proj = np.broadcast_to(K, (4, 3, 3)) @ np.concatenate(
            [Rs, Ts[:, :, None]], axis=2)
        xyz, valid = tri.triangulate_tracks(obs, tracks, proj)
        assert valid.all()
        np.testing.assert_allclose(xyz, pts, atol=1e-6)

    def test_filters_keep_good_drop_bad(self, rng):
        pts = rng.uniform(-1.5, 1.5, size=(40, 3))
        K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
        Rs, Ts = lookat_cameras(3)
        obs, tracks = make_obs(pts, K, Rs, Ts)
        # corrupt track 0's observation in frame 1 -> big reprojection error
        obs.xy[40 + 0] += 60.0
        proj = np.broadcast_to(K, (3, 3, 3)) @ np.concatenate(
            [Rs, Ts[:, :, None]], axis=2)
        xyz, valid = tri.triangulate_tracks(obs, tracks, proj)
        keep = tri.filter_tracks(xyz, valid, obs, tracks, proj, Rs, Ts,
                                 max_reproj_err=4.0, min_tri_angle_deg=0.5)
        assert not keep[0]
        assert keep[1:].all()
        np.testing.assert_allclose(xyz[keep], pts[keep], atol=1e-5)

    def test_min_angle_drops_degenerate_baseline(self, rng):
        pts = rng.uniform(-1.0, 1.0, size=(10, 3))
        K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
        # two nearly identical viewpoints -> tiny triangulation angle
        R0 = np.eye(3)
        T0 = np.array([0.0, 0.0, 8.0])
        Rs = np.stack([R0, R0])
        Ts = np.stack([T0, T0 + np.array([1e-5, 0, 0])])
        obs, tracks = make_obs(pts, K, Rs, Ts)
        proj = np.broadcast_to(K, (2, 3, 3)) @ np.concatenate(
            [Rs, Ts[:, :, None]], axis=2)
        xyz, valid = tri.triangulate_tracks(obs, tracks, proj)
        keep = tri.filter_tracks(xyz, valid, obs, tracks, proj, Rs, Ts,
                                 min_tri_angle_deg=0.5)
        assert not keep.any()

    def test_cheirality_drops_behind_camera(self, rng):
        K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
        R0 = np.eye(3)
        Rs = np.stack([R0, R0])
        Ts = np.stack([np.array([0.0, 0.0, 5.0]),
                       np.array([2.0, 0.0, 5.0])])
        # a point BEHIND both cameras (z_cam < 0)
        pts = np.array([[0.0, 0.0, -9.0]])
        obs, tracks = make_obs(pts, K, Rs, Ts)
        proj = np.broadcast_to(K, (2, 3, 3)) @ np.concatenate(
            [Rs, Ts[:, :, None]], axis=2)
        xyz, valid = tri.triangulate_tracks(obs, tracks, proj)
        keep = tri.filter_tracks(xyz, valid, obs, tracks, proj, Rs, Ts)
        assert not keep.any()


class TestTracks:
    def test_chain_merge(self):
        # 3 frames, 2 kps each; matches chain (0,a)-(1,a)-(2,a)
        offset = np.array([0, 2, 4, 6])
        matches = [(0, 1, np.array([[0, 0]])), (1, 2, np.array([[0, 0]]))]
        t = tri.build_tracks(offset, matches)
        assert t.n_tracks == 1
        assert t.track_of[0] == t.track_of[2] == t.track_of[4] == 0
        assert (t.track_of[[1, 3, 5]] == -1).all()

    def test_same_frame_conflict_dropped(self):
        # frame0 kp0 matches BOTH kps of frame1 -> the merged component
        # observes frame1 twice -> dropped wholesale
        offset = np.array([0, 1, 3])
        matches = [(0, 1, np.array([[0, 0], [0, 1]]))]
        t = tri.build_tracks(offset, matches)
        assert t.n_tracks == 0
        assert (t.track_of == -1).all()

    def test_disjoint_tracks(self):
        offset = np.array([0, 2, 4])
        matches = [(0, 1, np.array([[0, 1], [1, 0]]))]
        t = tri.build_tracks(offset, matches)
        assert t.n_tracks == 2
        assert t.track_of[0] == t.track_of[3]
        assert t.track_of[1] == t.track_of[2]
        assert t.track_of[0] != t.track_of[1]


class TestSiftEndToEnd:
    def test_two_view_plane(self, rng):
        """SIFT + matching + DLT on synthetic textured views of a plane at
        z = 5: triangulated points must sit near the plane."""
        cv2 = pytest.importorskip("cv2")
        H, W = 240, 320
        K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]])
        # blocky random texture (SIFT-friendly corners)
        tex = (rng.uniform(size=(30, 40, 3)) * 255).astype(np.uint8)
        tex = cv2.resize(tex, (W * 2, H * 2),
                         interpolation=cv2.INTER_NEAREST)

        # plane z=5 spanning x,y in [-3, 3]; texture pixel = linear map
        def render(Rw2c, T):
            # homography world-plane -> image: x_img = K [r1 r2 t'] x_plane
            A = np.array([[1 / 6.0 * (2 * W), 0, W],   # plane->tex coords
                          [0, 1 / 6.0 * (2 * H), H],
                          [0, 0, 1.0]])
            M = K @ np.stack([Rw2c[:, 0], Rw2c[:, 1],
                              Rw2c[:, 2] * 5.0 + T], axis=1)
            Hmat = M @ np.linalg.inv(A)
            return cv2.warpPerspective(tex, Hmat, (W, H))

        R0 = np.eye(3)
        views = [(R0, np.array([0.0, 0.0, 1.0])),
                 (R0, np.array([-0.8, 0.0, 1.0])),
                 (R0, np.array([0.8, 0.2, 1.0]))]
        images = [render(R, T) for R, T in views]
        Rs = np.stack([v[0] for v in views])
        Ts = np.stack([v[1] for v in views])
        xyz, rgb = tri.triangulate_known_poses(
            images, [None] * 3, K, Rs, Ts, max_features=3000,
            max_reproj_err=2.0, min_tri_angle_deg=0.5)
        assert len(xyz) > 50, "too few triangulated points"
        frac_on_plane = np.mean(np.abs(xyz[:, 2] - 5.0) < 0.15)
        assert frac_on_plane > 0.9
        assert rgb.shape == (len(xyz), 3)


class TestSegment:
    def test_nearest_sample_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        from torch.nn.functional import grid_sample
        H, W = 37, 53
        mask = rng.integers(0, 5, size=(H, W)).astype(np.float32)
        px = rng.uniform(0.3, W - 0.3, 400)
        py = rng.uniform(0.3, H - 0.3, 400)
        ours = seg.nearest_sample_aligned(mask, px, py)
        gx = (px / W) * 2.0 - 1.0
        gy = (py / H) * 2.0 - 1.0
        grid = torch.tensor(np.stack([gx, gy], -1), dtype=torch.float32)
        ref = grid_sample(torch.tensor(mask)[None, None],
                          grid[None, None], mode="nearest",
                          align_corners=True).squeeze().numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_tag_first_frame_wins(self):
        K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
        R = np.eye(3)
        T = np.array([0.0, 0.0, 4.0])
        pts = np.array([[0.0, 0.0, 0.0],     # projects to center
                        [0.0, 0.0, -9.0]])   # behind camera
        sem1 = np.zeros((48, 64), np.float32)
        sem1[20:28, 28:36] = 3.0             # object 3 at center
        sem2 = np.zeros((48, 64), np.float32)
        sem2[:, :] = 7.0
        T2 = np.array([0.0, 0.0, 12.0])   # brings the far point in front
        obj = seg.tag_object_points(
            pts, np.array([0.0, 0.0]), [0.0, 0.0],
            K, np.stack([R, R]), np.stack([T, T2]), [sem1, sem2])
        assert obj[0] == 3.0        # frame 1 tags it first (not 7.0 later)
        assert obj[1] == 7.0        # behind cam in frame 1 -> 0, frame 2 tags

    def test_out_of_view_is_zero(self):
        K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
        pts = np.array([[100.0, 0.0, 0.0]])
        sem = np.full((48, 64), 5.0, np.float32)
        obj = seg.tag_object_points(
            pts, np.array([0.0]), [0.0], K, np.eye(3)[None],
            np.array([[0.0, 0.0, 4.0]]), [sem])
        assert obj[0] == 0.0


class TestSceneCLI:
    def test_segment_pcd_scene(self, tmp_path):
        """Scene-level contract: load_scene_meta + tag + rewrite PLY."""
        from tests.test_data_cli import make_kitti_scene
        from adgs_tpu.data import ply as ply_lib
        root = make_kitti_scene(str(tmp_path / "scene"), n_frames=4,
                                width=64, height=48)
        meta = load_scene_meta(root, "nvs-75")
        assert meta.dataset == "kitti"
        assert meta.K.shape[1:] == (3, 3)
        assert (~meta.is_val).sum() >= 4

        import subprocess
        script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "segment_pcd.py")
        r = subprocess.run([sys.executable, script, root], env=dict(
            os.environ, JAX_PLATFORMS="cpu"), capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        _, _, _, obj = ply_lib.fetch_point_cloud(
            os.path.join(root, "points3d-75.ply"))
        assert obj.shape[0] == 300   # column rewritten, full cloud
