"""Unit tests for core math vs independent NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adgs_tpu.core import sh, quaternion, covariance, camera, splines
from tests import oracles


class TestSH:
    @pytest.mark.parametrize("deg", [0, 1, 2, 3])
    def test_eval_sh_matches_oracle(self, rng, deg):
        K = 16
        coeffs = rng.normal(size=(5, K, 3)).astype(np.float32)
        dirs = rng.normal(size=(5, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        got = sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs.astype(np.float32)))
        for i in range(5):
            want = oracles.sh_oracle(deg, coeffs[i], dirs[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = rng.uniform(size=(7, 3)).astype(np.float32)
        back = sh.sh_to_rgb(sh.rgb_to_sh(jnp.asarray(rgb)))
        np.testing.assert_allclose(back, rgb, rtol=1e-5, atol=1e-6)

    def test_eval_sh_color_clamps(self, rng):
        coeffs = np.zeros((4, 16, 3), dtype=np.float32)
        coeffs[:, 0, :] = -10.0  # large negative DC -> below 0 after +0.5
        means = rng.normal(size=(4, 3)).astype(np.float32)
        campos = jnp.zeros(3)
        clamped, raw = sh.eval_sh_color(3, jnp.asarray(coeffs), jnp.asarray(means), campos)
        assert np.all(np.asarray(clamped) == 0.0)
        assert np.all(np.asarray(raw) < 0.0)


class TestQuaternion:
    def test_multiply_matches_oracle(self, rng):
        q1 = rng.normal(size=(4,))
        q2 = rng.normal(size=(4,))
        got = quaternion.multiply(jnp.asarray(q1), jnp.asarray(q2))
        np.testing.assert_allclose(got, oracles.quat_mul(q1, q2), rtol=1e-5, atol=1e-6)

    def test_rotation_matrix(self, rng):
        q = rng.normal(size=(6, 4)).astype(np.float32)
        R = quaternion.to_rotation_matrix(jnp.asarray(q))
        for i in range(6):
            np.testing.assert_allclose(R[i], oracles.rotmat_from_quat(q[i]),
                                       rtol=1e-5, atol=1e-5)
        # rotation matrices are orthonormal
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (6, 3, 3)),
                                   atol=1e-5)

    def test_rotvec_roundtrip(self, rng):
        q = rng.normal(size=(10, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        rv = quaternion.unit_to_rotvec(jnp.asarray(q.astype(np.float32)))
        q2 = quaternion.rotvec_to_unit(rv)
        # up to sign (double cover)
        for i in range(10):
            a, b = np.asarray(q[i]), np.asarray(q2[i])
            if np.dot(a, b) < 0:
                b = -b
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_rotvec_matches_roma_semantics(self, rng):
        q = rng.normal(size=(8, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        got = quaternion.unit_to_rotvec(jnp.asarray(q.astype(np.float32)))
        for i in range(8):
            np.testing.assert_allclose(got[i], oracles.unitquat_to_rotvec(q[i]),
                                       atol=1e-5)

    def test_log_exp_identity_stable(self):
        q = jnp.asarray([[1.0, 1e-9, 0.0, 0.0]])
        out = quaternion.exp(quaternion.log(q))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, q, atol=1e-5)
        # gradients finite at near-identity
        g = jax.grad(lambda x: jnp.sum(quaternion.unit_to_rotvec(x)))(q)
        assert np.all(np.isfinite(g))


class TestCovariance:
    def test_cov3d_matches_oracle(self, rng):
        N = 16
        scales = np.exp(rng.normal(size=(N, 3))).astype(np.float32)
        quats = rng.normal(size=(N, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        got = covariance.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
        for i in range(N):
            want = oracles.cov3d_oracle(scales[i], quats[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)

    def test_cov2d_matches_oracle(self, rng):
        cam = camera.Camera.create(
            R=oracles.rotmat_from_quat(rng.normal(size=4)),
            T=np.array([0.1, -0.2, 0.5]),
            fovx=1.2, fovy=0.9, width=640, height=480)
        N = 32
        means = rng.normal(size=(N, 3)).astype(np.float32) * 2.0
        means[:, 2] += 8.0  # mostly in front
        scales = np.exp(rng.normal(size=(N, 3)) * 0.3).astype(np.float32)
        quats = rng.normal(size=(N, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        cov3d = covariance.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
        mean_view = camera.transform_point_4x3(jnp.asarray(means), cam.world_view)
        out = covariance.project_cov3d_to_2d(
            mean_view, cov3d, cam.world_view,
            cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy)
        wv = np.asarray(cam.world_view)
        for i in range(N):
            if float(mean_view[i, 2]) <= 0.2:
                continue
            want = oracles.cov2d_oracle(
                means[i].astype(np.float64), np.asarray(cov3d[i], dtype=np.float64),
                wv, cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy)
            np.testing.assert_allclose(np.asarray(out.cov[i]), want, rtol=2e-4, atol=2e-4)

    def test_conic_inverts_cov(self, rng):
        # conic is the matrix inverse of the 2x2 covariance
        cov = jnp.asarray([[2.0, 0.3, 1.5]])
        det = 2.0 * 1.5 - 0.09
        conic_want = np.array([1.5, -0.3, 2.0]) / det
        out_cov = covariance.Cov2D(
            cov=cov,
            conic=jnp.stack([cov[:, 2], -cov[:, 1], cov[:, 0]], -1) / det,
            det=jnp.asarray([det]), radius=jnp.asarray([1.0]))
        np.testing.assert_allclose(out_cov.conic[0], conic_want, rtol=1e-6)


class TestCamera:
    def test_world_to_view_convention(self, rng):
        # R is used untransposed (graphics_utils.py:46-58)
        R = oracles.rotmat_from_quat(rng.normal(size=4))
        T = rng.normal(size=3)
        wv = camera.world_to_view(R, T)
        p = rng.normal(size=3)
        np.testing.assert_allclose(wv[:3, :3] @ p + wv[:3, 3], R @ p + T, atol=1e-5)

    def test_projection_ndc(self):
        znear, zfar = 0.01, 100.0
        fovx = fovy = 1.0
        P = camera.projection_matrix(znear, zfar, fovx, fovy)
        # center of the near plane -> ndc z ~ 0, far plane -> ndc 1
        for z, want in [(znear, 0.0), (zfar, 1.0)]:
            v = P @ np.array([0.0, 0.0, z, 1.0])
            np.testing.assert_allclose(v[2] / v[3], want, atol=1e-5)

    def test_camera_center(self, rng):
        R = oracles.rotmat_from_quat(rng.normal(size=4))
        T = np.array([1.0, 2.0, 3.0])
        cam = camera.Camera.create(R=R, T=T, fovx=1.0, fovy=0.8, width=64, height=48)
        # camera center transforms to origin in view space
        v = camera.transform_point_4x3(cam.camera_center[None], cam.world_view)
        np.testing.assert_allclose(v, np.zeros((1, 3)), atol=1e-4)


class TestSplines:
    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
    def test_deboor_matrix(self, order):
        got = splines.deboor_cox_matrix(order)
        want = oracles.deboor_mat_oracle(order)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_bspline_partition_of_unity(self):
        for order in [1, 2, 3, 5]:
            for u in [0.0, 0.25, 0.7, 1.0]:
                b = splines.bspline_basis(jnp.asarray(u, dtype=jnp.float32), order)
                np.testing.assert_allclose(np.sum(np.asarray(b)), 1.0, atol=1e-5)

    @pytest.mark.parametrize("args", [
        [8, 3, 0, 0, 0, 0],     # bspline only
        [0, 0, 4, 0, 0, 0],     # poly only
        [0, 0, 0, 6, 0, 0],     # fft only
        [10, 5, 2, 3, 0, 0],    # mixed
    ])
    def test_vector_trajectory_matches_oracle(self, rng, args):
        cfg = splines.BasisConfig(*args)
        N, D = 5, 3
        param = rng.normal(size=(N, D, cfg.param_count)).astype(np.float32)
        for t in [0.0, 0.123, 0.5, 0.87, 0.999]:
            got = splines.eval_trajectory(jnp.asarray(t, dtype=jnp.float32),
                                          jnp.asarray(param), cfg)
            want = oracles.func_result_oracle(t, param, args)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("args", [
        [0, 0, 0, 0, 6, 2],
        [0, 0, 0, 0, 10, 5],
    ])
    def test_quat_trajectory_matches_oracle(self, rng, args):
        cfg = splines.BasisConfig(*args)
        N = 4
        param = (rng.normal(size=(N, 4, cfg.param_count)) * 0.3).astype(np.float32)
        for t in [0.0, 0.2, 0.51, 0.93]:
            got = splines.eval_quat_trajectory(jnp.asarray(t, dtype=jnp.float32),
                                               jnp.asarray(param), cfg)
            want = oracles.func_result_oracle(t, param, args)
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_quat_trajectory_unit_norm(self, rng):
        cfg = splines.BasisConfig(0, 0, 0, 0, 8, 3)
        param = (rng.normal(size=(6, 4, 8)) * 0.2).astype(np.float32)
        q = splines.eval_quat_trajectory(jnp.asarray(0.4, dtype=jnp.float32),
                                         jnp.asarray(param), cfg)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1),
                                   np.ones(6), atol=1e-5)

    def test_default_config(self):
        # arguments/__init__.py:71-77 defaults at 60 frames
        cfg = splines.default_basis_config([None, 5, 0, 6, 0, 0], 60, 3)
        assert cfg == splines.BasisConfig(20, 5, 0, 6, 0, 0)
        cfg = splines.default_basis_config([0, 0, 0, 0, None, 5], 60, 3)
        assert cfg == splines.BasisConfig(0, 0, 0, 0, 20, 5)
        # order capped below ctrl count
        cfg = splines.default_basis_config([3, 9, 0, 0, 0, 0], 60, 3)
        assert cfg.bspline_order == 2

    def test_trajectory_differentiable(self, rng):
        cfg = splines.BasisConfig(8, 3, 0, 4, 0, 0)
        param = jnp.asarray(rng.normal(size=(5, 3, cfg.param_count)).astype(np.float32))

        def f(p, t):
            return jnp.sum(splines.eval_trajectory(t, p, cfg) ** 2)

        g = jax.grad(f)(param, jnp.asarray(0.37, dtype=jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)
