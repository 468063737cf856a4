"""3D covariance construction and EWA projection to screen space.

Replicates the math of the reference CUDA preprocess:
  - computeCov3D (cuda_rasterizer/forward.cu:118-152): with unit quaternion q
    and R = build_rotation(q), glm evaluates Sigma = R^T diag(s^2) R (glm is
    column-major; `S*R` then `transpose(M)*M` lands on this form — NOT the
    R diag(s^2) R^T of the Python-side covariance_activation, which is only
    used for point-cloud export in the reference).
  - computeCov2D (cuda_rasterizer/forward.cu:74-113): view-space clamp of
    x/z, y/z to +-1.3*tanfov, EWA Jacobian, +0.3 pixel low-pass on the
    diagonal AFTER projection.
  - conic + radius (forward.cu:219-233): conic = inverse 2x2; radius =
    ceil(3*sqrt(max eigenvalue)) with the mid^2-det term clamped to >= 0.1.

All functions are batched over a leading N axis and jit/vjp friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp



def build_cov3d(scaling: jnp.ndarray, rotation: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """[N,3] activated scales + [N,4] unit wxyz quats -> [N,6] upper-tri
    covariance [xx, xy, xz, yy, yz, zz] with Sigma = R^T diag(s^2) R.

    Written as closed-form elementwise math: batched [N,3,3] einsums lower
    to tiny MXU matmuls with bf16 conversion fusions that profile ~10x
    slower than straight VPU arithmetic at N~1e6."""
    r, x, y, z = (rotation[..., 0], rotation[..., 1], rotation[..., 2],
                  rotation[..., 3])
    # rows of build_rotation (utils/general_utils.py:79-97)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s2 = (scale_modifier * scaling) ** 2
    s0, s1, s2_ = s2[..., 0], s2[..., 1], s2[..., 2]
    # Sigma_ij = sum_k s_k^2 R_ki R_kj
    return jnp.stack([
        s0 * r00 * r00 + s1 * r10 * r10 + s2_ * r20 * r20,
        s0 * r00 * r01 + s1 * r10 * r11 + s2_ * r20 * r21,
        s0 * r00 * r02 + s1 * r10 * r12 + s2_ * r20 * r22,
        s0 * r01 * r01 + s1 * r11 * r11 + s2_ * r21 * r21,
        s0 * r01 * r02 + s1 * r11 * r12 + s2_ * r21 * r22,
        s0 * r02 * r02 + s1 * r12 * r12 + s2_ * r22 * r22,
    ], axis=-1)


class Cov2D(NamedTuple):
    cov: jnp.ndarray    # [N,3] (xx, xy, yy) including the +0.3 low-pass
    conic: jnp.ndarray  # [N,3] inverse covariance (a, b, c)
    det: jnp.ndarray    # [N] determinant (post low-pass)
    radius: jnp.ndarray  # [N] float 3-sigma pixel radius (ceil applied)


def project_cov3d_to_2d(
    mean_view: jnp.ndarray,      # [N,3] view-space means (UNCLAMPED z>0 assumed)
    cov3d: jnp.ndarray,          # [N,6] upper-tri world covariance
    world_view: jnp.ndarray,     # [4,4] transposed world->view
    focal_x: float, focal_y: float,
    tan_fovx: float, tan_fovy: float,
) -> Cov2D:
    """EWA projection with the reference's clamps (forward.cu:74-113)."""
    tx, ty, tz = mean_view[..., 0], mean_view[..., 1], mean_view[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txz = jnp.clip(tx / tz, -limx, limx) * tz
    tyz = jnp.clip(ty / tz, -limy, limy) * tz

    # world->cam rotation (stored matrix is transposed)
    R_wc = world_view[:3, :3].T
    # Sigma_cam = R_wc Sigma R_wc^T, expanded elementwise (a batched-small
    # einsum lowers to pathological tiny-matmul fusions at N~1e6)
    a = R_wc  # [3,3] traced scalars
    v0, v1, v2 = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    v3, v4, v5 = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]
    # t_i = row i of (A @ Sigma)
    t00 = a[0, 0] * v0 + a[0, 1] * v1 + a[0, 2] * v2
    t01 = a[0, 0] * v1 + a[0, 1] * v3 + a[0, 2] * v4
    t02 = a[0, 0] * v2 + a[0, 1] * v4 + a[0, 2] * v5
    t10 = a[1, 0] * v0 + a[1, 1] * v1 + a[1, 2] * v2
    t11 = a[1, 0] * v1 + a[1, 1] * v3 + a[1, 2] * v4
    t12 = a[1, 0] * v2 + a[1, 1] * v4 + a[1, 2] * v5
    t20 = a[2, 0] * v0 + a[2, 1] * v1 + a[2, 2] * v2
    t21 = a[2, 0] * v1 + a[2, 1] * v3 + a[2, 2] * v4
    t22 = a[2, 0] * v2 + a[2, 1] * v4 + a[2, 2] * v5

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # EWA Jacobian rows: j0 = [fx/tz, 0, -fx*tx/tz^2], j1 = [0, fy/tz, -fy*ty/tz^2]
    j00 = focal_x * inv_z
    j02 = -focal_x * txz * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tyz * inv_z2

    s00 = t00 * a[0, 0] + t01 * a[0, 1] + t02 * a[0, 2]
    s01 = t00 * a[1, 0] + t01 * a[1, 1] + t02 * a[1, 2]
    s02 = t00 * a[2, 0] + t01 * a[2, 1] + t02 * a[2, 2]
    s11 = t10 * a[1, 0] + t11 * a[1, 1] + t12 * a[1, 2]
    s12 = t10 * a[2, 0] + t11 * a[2, 1] + t12 * a[2, 2]
    s22 = t20 * a[2, 0] + t21 * a[2, 1] + t22 * a[2, 2]

    cxx = j00 * (j00 * s00 + j02 * s02) + j02 * (j00 * s02 + j02 * s22) + 0.3
    cxy = j00 * (j11 * s01 + j12 * s02) + j02 * (j11 * s12 + j12 * s22)
    cyy = j11 * (j11 * s11 + j12 * s12) + j12 * (j11 * s12 + j12 * s22) + 0.3

    det = cxx * cyy - cxy * cxy
    safe_det = jnp.where(det == 0.0, 1.0, det)
    det_inv = 1.0 / safe_det
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))

    cov = jnp.stack([cxx, cxy, cyy], axis=-1)
    return Cov2D(cov=cov, conic=conic, det=det, radius=radius)
