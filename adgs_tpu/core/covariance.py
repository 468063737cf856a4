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

from .quaternion import to_rotation_matrix


def build_cov3d(scaling: jnp.ndarray, rotation: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """[N,3] activated scales + [N,4] unit wxyz quats -> [N,6] upper-tri
    covariance [xx, xy, xz, yy, yz, zz] with Sigma = R^T diag(s^2) R."""
    R = to_rotation_matrix(rotation, normalized=True)  # [N,3,3]
    M = (scale_modifier * scaling)[..., None] * R      # diag(s) @ R, rows scaled
    sigma = jnp.einsum("nij,nik->njk", M, M)           # M^T M
    return jnp.stack(
        [sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
         sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2]],
        axis=-1,
    )


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
    # Sigma_cam = R_wc Sigma R_wc^T, via full symmetric matrix
    s = cov3d
    sigma = jnp.stack(
        [
            jnp.stack([s[..., 0], s[..., 1], s[..., 2]], axis=-1),
            jnp.stack([s[..., 1], s[..., 3], s[..., 4]], axis=-1),
            jnp.stack([s[..., 2], s[..., 4], s[..., 5]], axis=-1),
        ],
        axis=-2,
    )  # [N,3,3]
    sigma_cam = jnp.einsum("ij,njk,lk->nil", R_wc, sigma, R_wc)

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # EWA Jacobian rows: j0 = [fx/tz, 0, -fx*tx/tz^2], j1 = [0, fy/tz, -fy*ty/tz^2]
    j00 = focal_x * inv_z
    j02 = -focal_x * txz * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tyz * inv_z2

    s00 = sigma_cam[..., 0, 0]
    s01 = sigma_cam[..., 0, 1]
    s02 = sigma_cam[..., 0, 2]
    s11 = sigma_cam[..., 1, 1]
    s12 = sigma_cam[..., 1, 2]
    s22 = sigma_cam[..., 2, 2]

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
