"""Camera math and the Camera pytree.

Conventions mirror the reference exactly so that cameras, checkpoints and
projection results interoperate:

  - getWorld2View2 (utils/graphics_utils.py:46-58): NOTE the reference does
    NOT transpose R when assembling world->view (unlike stock 3DGS) — the
    dataset readers already store the world->camera rotation.
  - The stored `world_view_transform` / `full_proj_transform` are the
    TRANSPOSED 4x4s (scene/cameras.py:76-78), i.e. points transform as
    row-vectors: p' = [p, 1] @ M. The CUDA transformPoint4x4
    (auxiliary.h:68-77) indexes the raw buffer in exactly that convention.
  - getProjectionMatrix (utils/graphics_utils.py:60-80): z_sign=+1, maps view
    z in [znear, zfar] to NDC z in [~0, 1] pre-division.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world->view, math (column-vector) convention.

    utils/graphics_utils.py:46-58 — R is used as-is (already world->cam)."""
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection, math convention (utils/graphics_utils.py:60-80)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Device-side camera for rendering. All matrices are stored TRANSPOSED
    (row-vector convention), matching scene/cameras.py:76-79.

    Static metadata (image size, fov tangents) lives in aux fields so a
    Camera can be passed straight through jit without retracing on pose
    changes.
    """

    world_view: jnp.ndarray  # [4,4] transposed world->view
    full_proj: jnp.ndarray   # [4,4] transposed world->NDC (= wv @ proj^T)
    camera_center: jnp.ndarray  # [3]
    time: jnp.ndarray  # scalar in [0,1)

    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    tan_fovx: float = dataclasses.field(metadata=dict(static=True))
    tan_fovy: float = dataclasses.field(metadata=dict(static=True))

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tan_fovy)

    @classmethod
    def create(cls, R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
               width: int, height: int, time: float = 0.0,
               znear: float = 0.01, zfar: float = 100.0,
               trans: np.ndarray | None = None, scale: float = 1.0) -> "Camera":
        wv = world_to_view(R, T, trans, scale).T  # store transposed
        proj = projection_matrix(znear, zfar, fovx, fovy).T
        full = wv @ proj
        cam_center = np.linalg.inv(wv)[3, :3]
        return cls(
            world_view=jnp.asarray(wv, dtype=jnp.float32),
            full_proj=jnp.asarray(full, dtype=jnp.float32),
            camera_center=jnp.asarray(cam_center, dtype=jnp.float32),
            time=jnp.asarray(time, dtype=jnp.float32),
            width=int(width),
            height=int(height),
            tan_fovx=float(math.tan(fovx / 2)),
            tan_fovy=float(math.tan(fovy / 2)),
        )


def transform_point_4x4(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x transposed-4x4 -> [N,4] homogeneous (auxiliary.h:68-77)."""
    return jnp.matmul(p, m[:3, :4], precision="highest") + m[3, :4]


def transform_point_4x3(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x transposed-4x4 -> [N,3] affine (auxiliary.h:57-66)."""
    return jnp.matmul(p, m[:3, :3], precision="highest") + m[3, :3]


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5
