"""Tests for the model layer (Gaussians, env map) and loss ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adgs_tpu.core import splines
from adgs_tpu.models import gaussians as gm
from adgs_tpu.models.env_map import EnvironmentMap, camera_rays
from adgs_tpu.ops import knn, image as image_ops, depth as depth_ops, flow as flow_ops
from adgs_tpu import render as render_lib
from tests import oracles, scene_fixtures as fx


def tiny_config(frames=20):
    return gm.GaussianConfig.from_order_args(
        dict(xyz=[4, 2, 0, 2, 0, 0], rotation=[0, 0, 0, 0, 4, 2],
             shs=[0, 0, 0, 2, 0, 0], background=[0, 0, 1, 0, 0, 0]),
        frame_num=frames, sh_degree=2)


def tiny_model(rng, n=50, frac_obj=0.5, quantum=32):
    cfg = tiny_config()
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    obj_id = (rng.random(n) < frac_obj).astype(np.float32)
    times = rng.uniform(size=n).astype(np.float32)
    d2 = knn.mean_knn_sq_dist(pts)
    params, state = gm.create_from_pcd(pts, cols, obj_id, times, cfg, d2,
                                       capacity_quantum=quantum)
    return params, state, cfg, dict(pts=pts, cols=cols, obj_id=obj_id,
                                    times=times, d2=d2)


class TestGaussianModel:
    def test_create_shapes_and_init(self, rng):
        params, state, cfg, raw = tiny_model(rng)
        ns = int((raw["obj_id"] <= 0.5).sum())
        no = int((raw["obj_id"] > 0.5).sum())
        assert int(state.num_scene) == ns and int(state.num_obj) == no
        # opacity init: sigmoid(raw) == 0.1 on alive slots
        op = jax.nn.sigmoid(params.scene_opacity[:ns])
        np.testing.assert_allclose(op, 0.1, atol=1e-5)
        # scale init: exp(raw) == sqrt(mean 3nn d2)
        scene_sel = raw["obj_id"] <= 0.5
        want = np.sqrt(np.maximum(raw["d2"][scene_sel], 1e-7))
        np.testing.assert_allclose(np.exp(params.scene_scaling[:ns, 0]), want,
                                   rtol=1e-5)
        # dead slots inert
        assert np.all(np.asarray(jax.nn.sigmoid(params.scene_opacity[ns:])) < 1e-5)

    def test_deformed_xyz_matches_oracle(self, rng):
        params, state, cfg, raw = tiny_model(rng)
        no = int(state.num_obj)
        t = 0.37
        got = gm.deformed_xyz(params, cfg, jnp.float32(t))
        # oracle: obj trajectory + background trajectory
        xyz_d = oracles.func_result_oracle(
            t, np.asarray(params.xyz_deform[:no]), list(cfg.xyz))
        bg_d = oracles.func_result_oracle(
            t, np.asarray(params.background_deform), list(cfg.background))
        ns_cap = params.scene_capacity
        want_obj = np.asarray(params.obj_xyz[:no]) + xyz_d + bg_d
        want_scene = np.asarray(params.scene_xyz) + bg_d
        np.testing.assert_allclose(got[:ns_cap], want_scene, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(got[ns_cap:ns_cap + no], want_obj,
                                   rtol=1e-4, atol=1e-6)

    def test_deformed_rotation_quat_spline(self, rng):
        params, state, cfg, _ = tiny_model(rng)
        no = int(state.num_obj)
        t = 0.61
        got = gm.deformed_rotation(params, cfg, jnp.float32(t))
        want_obj = oracles.func_result_oracle(
            t, np.asarray(params.rotation_deform[:no]), list(cfg.rotation))
        want_obj = want_obj / np.linalg.norm(want_obj, axis=-1, keepdims=True)
        ns_cap = params.scene_capacity
        np.testing.assert_allclose(got[ns_cap:ns_cap + no], want_obj,
                                   rtol=1e-4, atol=1e-5)

    def test_time_masked_opacity(self, rng):
        params, state, cfg, _ = tiny_model(rng)
        params = gm.set_init_time_sigma(params, frame_gap=0.05)
        t = jnp.float32(0.5)
        got = gm.time_masked_opacity(params, state, t)
        no = int(state.num_obj)
        ns_cap = params.scene_capacity
        delta = 0.5 - np.asarray(state.gs_time[:no])
        sigma = np.exp(np.asarray(params.gs_time_sigma[:no]))
        sig = np.where(delta < 0, sigma[:, 0], sigma[:, 1])
        mask = np.exp(-0.5 * (delta / sig) ** 2)
        want = 0.1 * mask
        np.testing.assert_allclose(got[ns_cap:ns_cap + no, 0], want, rtol=1e-4)

    def test_render_bridge_with_env(self, rng):
        params, state, cfg, _ = tiny_model(rng, n=80)
        cam = fx.make_camera(width=48, height=32)
        env = EnvironmentMap.create(resolution=64)
        rays = jnp.asarray(camera_rays(cam.focal_x, cam.height, cam.width))
        out = render_lib.render(cam, params, state, cfg, env_map=env,
                                cam_rays=rays, render_objmask=True,
                                capacity=1 << 13, max_per_tile=256)
        assert out["render"].shape == (3, 32, 48)
        assert out["img_semantic"].shape == (1, 32, 48)
        assert np.all(np.isfinite(np.asarray(out["render"])))
        # sky (zero-opacity pixels) should be close to sigmoid(~0) = 0.5 env
        op = np.asarray(out["img_opacity"])
        if np.any(op < 0.01):
            sky_px = np.asarray(out["render"])[:, op < 0.01]
            np.testing.assert_allclose(sky_px, 0.5, atol=0.02)


class TestEnvMap:
    def test_grid_sample_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        env = EnvironmentMap(grid=jnp.asarray(
            rng.normal(size=(3, 16, 32)).astype(np.float32)))
        dirs = rng.normal(size=(10, 7, 3)).astype(np.float32)
        got = env.color(jnp.asarray(dirs))  # [3, 10, 7]

        d = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        az = np.arctan2(d[..., 1], d[..., 0])
        el = np.arctan2(d[..., 2], np.hypot(d[..., 0], d[..., 1]))
        ang = np.stack([az / np.pi, el * 2 / np.pi], axis=-1)
        tg = torch.tensor(np.asarray(env.grid))[None]
        tout = F.grid_sample(tg, torch.tensor(ang)[None], align_corners=True)
        want = torch.sigmoid(tout)[0].numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grid_sample_grad_matches_torch(self, rng):
        """The custom_vjp backward (flat per-channel scatter, env_map.py)
        must reproduce torch grid_sample's grid gradient, including
        out-of-bounds zero-padding taps."""
        import torch
        import torch.nn.functional as F
        from adgs_tpu.models.env_map import _grid_sample_align_corners
        grid = rng.normal(size=(3, 16, 32)).astype(np.float32)
        # include coords outside [-1,1] to exercise the padding gate
        coords = (rng.uniform(size=(9, 11, 2)) * 2.6 - 1.3).astype(
            np.float32)
        w = rng.normal(size=(3, 9, 11)).astype(np.float32)

        def loss(g):
            return jnp.sum(
                _grid_sample_align_corners(g, jnp.asarray(coords))
                * jnp.asarray(w))
        got = np.asarray(jax.grad(loss)(jnp.asarray(grid)))

        tg = torch.tensor(grid, requires_grad=True)
        tout = F.grid_sample(tg[None], torch.tensor(coords)[None],
                             align_corners=True, padding_mode="zeros")
        (tout[0] * torch.tensor(w)).sum().backward()
        np.testing.assert_allclose(got, tg.grad.numpy(), rtol=1e-4,
                                   atol=1e-5)

    def test_angles_roundtrip(self, rng):
        from adgs_tpu.models.env_map import direction_to_angles, angles_to_direction
        d = rng.normal(size=(20, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        back = angles_to_direction(direction_to_angles(jnp.asarray(
            d.astype(np.float32))))
        np.testing.assert_allclose(back, d, atol=1e-5)


class TestKNN:
    def test_mean_knn_matches_bruteforce(self, rng):
        pts = rng.normal(size=(200, 3))
        got = knn.mean_knn_sq_dist(pts, k=3)
        diff = pts[:, None] - pts[None]
        d2 = np.sum(diff ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        want = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_knn_indices(self, rng):
        pts = rng.normal(size=(100, 3))
        anchors = pts[:10]
        idx = knn.knn_indices(anchors, pts, k=4)
        assert idx.shape == (10, 4)
        # first neighbor of an anchor that IS a point = itself
        np.testing.assert_array_equal(idx[:, 0], np.arange(10))

    def test_knn_device_approx(self, rng):
        pts = jnp.asarray(rng.uniform(size=(512, 3)).astype(np.float32))
        anchors = pts[:32]
        idx = knn.knn_indices_device(anchors, pts, k=4, window=128)
        exact = knn.knn_indices(np.asarray(anchors), np.asarray(pts), k=4)
        # with a large window, recall should be high
        rec = np.mean([len(set(map(int, a)) & set(map(int, b))) / 4.0
                       for a, b in zip(np.asarray(idx), exact)])
        assert rec > 0.9


class TestLossOps:
    def test_ssim_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        a = rng.uniform(size=(3, 33, 47)).astype(np.float32)
        b = rng.uniform(size=(3, 33, 47)).astype(np.float32)
        got = image_ops.ssim(jnp.asarray(a), jnp.asarray(b))

        # reference transcription (utils/loss_utils.py:26-66)
        w1d = torch.exp(-(torch.arange(11, dtype=torch.float64) - 5) ** 2 / (2 * 1.5 ** 2))
        w1d = (w1d / w1d.sum()).float()
        win = (w1d[:, None] @ w1d[None, :])[None, None].repeat(3, 1, 1, 1)
        ta, tb = torch.tensor(a)[None], torch.tensor(b)[None]
        mu1 = F.conv2d(ta, win, padding=5, groups=3)
        mu2 = F.conv2d(tb, win, padding=5, groups=3)
        s1 = F.conv2d(ta * ta, win, padding=5, groups=3) - mu1 ** 2
        s2 = F.conv2d(tb * tb, win, padding=5, groups=3) - mu2 ** 2
        s12 = F.conv2d(ta * tb, win, padding=5, groups=3) - mu1 * mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        want = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
                / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))).mean().item()
        np.testing.assert_allclose(float(got), want, rtol=1e-4)

    def test_depth_scale_shift(self, rng):
        pred = rng.uniform(size=(20, 30))
        scale, shift = 2.7, -0.4
        target = scale * pred + shift
        s, sh_ = depth_ops.depth_scale_shift(jnp.asarray(pred, dtype=jnp.float32),
                                             jnp.asarray(target, dtype=jnp.float32))
        np.testing.assert_allclose([float(s), float(sh_)], [scale, shift],
                                   rtol=1e-3)
        loss = depth_ops.depth_loss(jnp.asarray(pred, dtype=jnp.float32),
                                    jnp.asarray(target, dtype=jnp.float32))
        assert float(loss) < 1e-4

    def test_flow_loss_matches_gather_impl(self, rng):
        H, W = 12, 16
        pkg = flow_ops.FlowPackage(
            time=jnp.float32(0.2),
            K=jnp.asarray(np.array([[50, 0, 8], [0, 50, 6], [0, 0, 1.0]]),
                          dtype=jnp.float32),
            R=jnp.eye(3),
            T=jnp.asarray([0.0, 0.0, 3.0]),
            flow=jnp.asarray(rng.uniform(0, 14, size=(2, H, W)).astype(np.float32)),
            vis=jnp.asarray((rng.random((H, W)) > 0.4).astype(np.float32)),
        )
        img_flow = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
        opac = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))
        got = float(flow_ops.flow_loss(img_flow, pkg, opac, dist=1e-3))

        # gather-style reference implementation
        flow = np.asarray(pkg.flow)
        vis = (np.asarray(pkg.vis) > 0.5) & (flow[0] <= W - 1) & (flow[0] >= 0) \
            & (flow[1] <= H - 1) & (flow[1] >= 0)
        ys, xs = np.nonzero(vis)
        pts = np.asarray(img_flow)[:, ys, xs].T
        proj = (np.asarray(pkg.K) @ (np.eye(3) @ pts.T + np.asarray(pkg.T)[:, None])).T
        front = proj[:, 2] > 1e-3
        uv = proj[:, :2] / np.maximum(proj[:, 2:], 1e-3)
        w = np.asarray(opac)[ys, xs] * front
        err = np.abs(uv - flow[:, ys, xs].T) * w[:, None]
        err[:, 0] /= W
        err[:, 1] /= H
        want = err.sum(-1).mean()
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_psnr(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.ones((3, 8, 8)) * 0.1
        np.testing.assert_allclose(float(image_ops.psnr(a, b)), 20.0, atol=1e-4)


class TestNearIdxDevice:
    def test_parity_vs_host_refresh(self, rng):
        """near_idx_device vs the exact scipy path: anchors are alive-only,
        indices land on alive padded slots, and neighbor recall is high."""
        import jax
        N, n_alive, K = 512, 300, 8
        pts = np.zeros((N, 4), np.float32)
        pts[:, :3] = rng.uniform(size=(N, 3)).astype(np.float32) * 10
        pts[:, 3] = rng.uniform(size=N).astype(np.float32) * 5
        alive = np.zeros(N, bool)
        alive_idx = rng.permutation(N)[:n_alive]
        alive[alive_idx] = True
        a_cap = N // K
        idx, valid = knn.near_idx_device(
            jnp.asarray(pts), jnp.asarray(alive),
            jax.random.PRNGKey(0), K, a_cap, window=128)
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert idx.shape == (a_cap, K) and valid.shape == (a_cap,)
        assert valid.sum() == n_alive // K
        # every referenced slot of a valid anchor group is alive
        assert alive[idx[valid]].all()
        # recall vs exact KNN over the alive subset (self is the anchor's
        # own nearest; windows cover dense 3-D clouds well at 128)
        exact_sets = {}
        live_pts = pts[alive]
        live_map = np.nonzero(alive)[0]
        from adgs_tpu.ops.knn import knn_indices
        for g in idx[valid]:
            a = g[0]  # device anchor: nearest neighbor is itself
            pos = int(np.nonzero(live_map == a)[0][0])
            ex = live_map[knn_indices(live_pts[pos:pos + 1], live_pts, K)[0]]
            exact_sets[int(a)] = set(map(int, ex))
        rec = np.mean([len(set(map(int, g)) & exact_sets[int(g[0])]) / K
                       for g in idx[valid]])
        assert rec > 0.85, rec

    def test_too_few_alive_yields_invalid(self, rng):
        import jax
        pts = rng.uniform(size=(64, 3)).astype(np.float32)
        alive = np.zeros(64, bool)
        alive[:3] = True
        idx, valid = knn.near_idx_device(
            jnp.asarray(pts), jnp.asarray(alive),
            jax.random.PRNGKey(1), 8, 8)
        assert not np.asarray(valid).any()
