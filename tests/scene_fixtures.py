"""Synthetic tiny scenes for renderer tests."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from adgs_tpu.core.camera import Camera
from adgs_tpu.raster.types import RasterSettings


def make_camera(width=48, height=40, fovx=1.1, fovy=0.9, time=0.0,
                rng=None) -> Camera:
    R = np.eye(3)
    if rng is not None:
        # small random rotation
        a = rng.normal(size=3) * 0.1
        A = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        from scipy.linalg import expm
        R = expm(A)
    T = np.array([0.0, 0.0, 4.0])
    return Camera.create(R=R, T=T, fovx=fovx, fovy=fovy, width=width,
                         height=height, time=time)


def settings_from_camera(cam: Camera, sh_degree=3, inv_depth=True,
                         bg=(0.0, 0.0, 0.0)) -> RasterSettings:
    return RasterSettings(
        viewmatrix=cam.world_view,
        projmatrix=cam.full_proj,
        campos=cam.camera_center,
        bg=jnp.asarray(bg, dtype=jnp.float32),
        image_height=cam.height,
        image_width=cam.width,
        tanfovx=cam.tan_fovx,
        tanfovy=cam.tan_fovy,
        sh_degree=sh_degree,
        inv_depth=inv_depth,
    )


def make_gaussians(rng, n=300, sh_degree=3, spread=1.5, z_span=(2.0, 8.0),
                   scale_log_mean=-2.5):
    """Random Gaussian cloud in front of the fixture camera."""
    K = (sh_degree + 1) ** 2
    xyz = rng.normal(size=(n, 3)) * spread
    xyz[:, 2] = rng.uniform(z_span[0] - 4.0, z_span[1] - 4.0, size=n)
    shs = np.zeros((n, K, 3))
    shs[:, 0] = rng.uniform(-1.0, 3.0, size=(n, 3))
    shs[:, 1:] = rng.normal(size=(n, K - 1, 3)) * 0.1
    scales = np.exp(rng.normal(size=(n, 3)) * 0.5 + scale_log_mean)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.05, 0.95, size=n)
    return dict(
        means3d=jnp.asarray(xyz, dtype=jnp.float32),
        shs=jnp.asarray(shs, dtype=jnp.float32),
        scales=jnp.asarray(scales, dtype=jnp.float32),
        rotations=jnp.asarray(quats, dtype=jnp.float32),
        opacities=jnp.asarray(opac, dtype=jnp.float32),
    )
