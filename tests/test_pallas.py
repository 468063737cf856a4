"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU): image and
gradient parity vs the reference oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adgs_tpu.raster.api import rasterize
from tests import scene_fixtures as fx


def _scene(rng, n=256, w=64, h=48):
    cam = fx.make_camera(width=w, height=h)
    st = fx.settings_from_camera(cam, bg=(0.2, 0.3, 0.1))
    g = fx.make_gaussians(rng, n=n)
    return st, g


class TestPallasForward:
    def test_matches_reference(self, rng):
        st, g = _scene(rng)
        flow = jnp.asarray(rng.normal(size=(256, 3)), dtype=jnp.float32)
        sem = jnp.asarray(rng.uniform(size=(256, 1)), dtype=jnp.float32)
        args = dict(means3d=g["means3d"], opacities=g["opacities"],
                    scales=g["scales"], rotations=g["rotations"],
                    settings=st, shs=g["shs"], flow_points=flow, semantic=sem)
        ref = rasterize(backend="reference", **args)
        pal = rasterize(backend="pallas", capacity=1 << 14, **args)
        np.testing.assert_allclose(pal.color, ref.color, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pal.depth, ref.depth, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pal.opacity, ref.opacity, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(pal.flow, ref.flow, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pal.semantic, ref.semantic, rtol=1e-4,
                                   atol=1e-4)

    def test_saturated_early_exit(self, rng):
        st, g = _scene(rng)
        g = dict(g)
        g["opacities"] = jnp.ones_like(g["opacities"]) * 0.99
        args = dict(means3d=g["means3d"], opacities=g["opacities"],
                    scales=g["scales"], rotations=g["rotations"],
                    settings=st, shs=g["shs"])
        ref = rasterize(backend="reference", **args)
        pal = rasterize(backend="pallas", capacity=1 << 14, **args)
        np.testing.assert_allclose(pal.color, ref.color, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pal.opacity, ref.opacity, rtol=1e-4,
                                   atol=1e-4)


class TestPallasBackward:
    def test_grads_match_reference(self, rng):
        st, g = _scene(rng, n=128, w=48, h=32)
        target = jnp.asarray(rng.uniform(size=(3, 32, 48)), dtype=jnp.float32)

        def loss(params, backend):
            out = rasterize(
                means3d=params["means3d"], opacities=params["opacities"],
                scales=params["scales"], rotations=params["rotations"],
                settings=st, shs=params["shs"], backend=backend,
                capacity=1 << 13)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth)
                    + 0.05 * jnp.mean(out.opacity))

        g_ref = jax.grad(lambda p: loss(p, "reference"))(g)
        g_pal = jax.grad(lambda p: loss(p, "pallas"))(g)
        for k in g:
            np.testing.assert_allclose(
                g_pal[k], g_ref[k], rtol=5e-3, atol=2e-5,
                err_msg=f"pallas grad mismatch for {k}")

    def test_scan_mxu_parity(self, rng, monkeypatch):
        """The MXU triangular-matmul prefix tier (SCAN="mxu") matches the
        roll tier to f32-limb precision (a measured-slower but kept path;
        see render.py SCAN docs)."""
        from adgs_tpu.raster.pallas import render as pal
        st, g = _scene(rng, n=128, w=48, h=32)
        target = jnp.asarray(rng.uniform(size=(3, 32, 48)), dtype=jnp.float32)

        def loss(params):
            out = rasterize(
                means3d=params["means3d"], opacities=params["opacities"],
                scales=params["scales"], rotations=params["rotations"],
                settings=st, shs=params["shs"], backend="pallas",
                capacity=1 << 13)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))

        monkeypatch.setattr(pal, "SCAN", "roll")
        l_roll, g_roll = jax.value_and_grad(loss)(g)
        monkeypatch.setattr(pal, "SCAN", "mxu")
        l_mxu, g_mxu = jax.value_and_grad(loss)(g)
        np.testing.assert_allclose(float(l_mxu), float(l_roll), rtol=1e-5)
        for k in g:
            np.testing.assert_allclose(g_mxu[k], g_roll[k], rtol=1e-3,
                                       atol=1e-6, err_msg=k)

    def test_flow_semantic_grads(self, rng):
        st, g = _scene(rng, n=96, w=48, h=32)
        flow = jnp.asarray(rng.normal(size=(96, 3)), dtype=jnp.float32)
        sem = jnp.asarray(rng.uniform(size=(96, 1)), dtype=jnp.float32)

        def loss(fl, se, backend):
            out = rasterize(
                means3d=g["means3d"], opacities=g["opacities"],
                scales=g["scales"], rotations=g["rotations"], settings=st,
                shs=g["shs"], flow_points=fl, semantic=se, backend=backend,
                capacity=1 << 13)
            return jnp.mean(out.flow ** 2) + jnp.mean(out.semantic ** 2)

        gr = jax.grad(lambda f, s: loss(f, s, "reference"), argnums=(0, 1))(
            flow, sem)
        gp = jax.grad(lambda f, s: loss(f, s, "pallas"), argnums=(0, 1))(
            flow, sem)
        np.testing.assert_allclose(gp[0], gr[0], rtol=5e-3, atol=2e-6)
        np.testing.assert_allclose(gp[1], gr[1], rtol=5e-3, atol=2e-6)
