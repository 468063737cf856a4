"""Per-Gaussian preprocessing: projection, covariance, conic, radii, rects.

Differentiable jnp replication of preprocessCUDA (forward.cu:156-256) plus
the frustum test (auxiliary.h:139-164). Everything is dense [N]-shaped; culled
Gaussians carry radius 0 / tiles_touched 0 and are masked downstream. Being
pure elementwise/vmapped math, XLA fuses this whole stage into a handful of
kernels and JAX autodiff provides the exact preprocess backward
(backward.cu:144-414) for free.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import sh as sh_lib
from ..core.covariance import build_cov3d, project_cov3d_to_2d
from ..core.camera import ndc_to_pix, transform_point_4x3, transform_point_4x4
from .types import RasterSettings, TILE_X, TILE_Y


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray        # [N,2] pixel-space centers
    depth: jnp.ndarray         # [N] view-space z
    conic: jnp.ndarray         # [N,3] inverse 2D covariance (a,b,c)
    opacity: jnp.ndarray       # [N] per-Gaussian opacity
    rgb: jnp.ndarray           # [N,3] SH-evaluated (clamped) colors
    radii: jnp.ndarray         # [N] float pixel radius (0 = culled)
    extent: jnp.ndarray        # [N,2] per-axis 3-sigma half extents (px)
    rect_min: jnp.ndarray      # [N,2] int32 tile rect (x, y) inclusive
    rect_max: jnp.ndarray      # [N,2] int32 tile rect (x, y) exclusive
    tiles_touched: jnp.ndarray  # [N] int32
    visible: jnp.ndarray       # [N] bool (radius > 0 and in frustum)


def get_rect(mean2d: jnp.ndarray, extent: jnp.ndarray,
             grid_x: int, grid_y: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tile rectangle per Gaussian from per-axis half extents.

    The reference's getRect (auxiliary.h:46-57) uses the isotropic
    3*sqrt(lambda_max) radius; we use the exact axis-aligned bounding box
    of the support ellipse (preprocess computes per-axis half extents) —
    strictly tighter for anisotropic Gaussians, cutting the duplicated
    instance count every per-instance pipeline stage scales with.

    EXACT float tile coverage: pixels are evaluated at integer coords, so
    the covered pixels are [ceil(lo), floor(hi)] and the tile range is
    [ceil(lo)//T, floor(hi)//T + 1). The reference's
    `(hi + BLOCK - 1) / BLOCK` trick is only correct for integer hi — with
    float screen coordinates it EXCLUDES the last covered tile whenever
    hi mod T < 1 (dropping pixels whose alpha clears the 1/255 gate), and
    its truncated lo includes one never-covered tile whenever
    lo mod T > T-1. The exact form fixes both (net-zero expected instance
    count: each rounding happens with probability 1/T per axis)."""
    rx = extent[..., 0]
    ry = extent[..., 1]

    def ifloor(v):
        return jnp.floor(v).astype(jnp.int32)

    rmin_x = jnp.clip(ifloor(jnp.ceil(mean2d[..., 0] - rx) / TILE_X), 0, grid_x)
    rmin_y = jnp.clip(ifloor(jnp.ceil(mean2d[..., 1] - ry) / TILE_Y), 0, grid_y)
    rmax_x = jnp.clip(ifloor(jnp.floor(mean2d[..., 0] + rx) / TILE_X) + 1,
                      0, grid_x)
    rmax_y = jnp.clip(ifloor(jnp.floor(mean2d[..., 1] + ry) / TILE_Y) + 1,
                      0, grid_y)
    return (jnp.stack([rmin_x, rmin_y], axis=-1),
            jnp.stack([rmax_x, rmax_y], axis=-1))


def preprocess(
    means3d: jnp.ndarray,           # [N,3]
    scales: jnp.ndarray,            # [N,3] activated
    rotations: jnp.ndarray,         # [N,4] unit wxyz
    opacities: jnp.ndarray,         # [N] or [N,1] activated
    shs: Optional[jnp.ndarray],     # [N,K,3] or None
    settings: RasterSettings,
    colors_precomp: Optional[jnp.ndarray] = None,  # [N,3]
    screen_offset: Optional[jnp.ndarray] = None,   # [N,2] zeros; grad = dL/dmean2D
    active_mask: Optional[jnp.ndarray] = None,     # [N] bool; False = padded slot
) -> Preprocessed:
    if opacities.ndim == 2:
        opacities = opacities[..., 0]

    # Frustum cull: view-space z > 0.2 (auxiliary.h:154-157)
    p_view = transform_point_4x3(means3d, settings.viewmatrix)
    in_front = p_view[..., 2] > 0.2

    # Projection to NDC then pixels (forward.cu:197-200, 234)
    p_hom = transform_point_4x4(means3d, settings.projmatrix)
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]
    mean2d = jnp.stack(
        [ndc_to_pix(p_proj[..., 0], settings.image_width),
         ndc_to_pix(p_proj[..., 1], settings.image_height)],
        axis=-1,
    )
    if screen_offset is not None:
        mean2d = mean2d + screen_offset

    cov3d = build_cov3d(scales, rotations, settings.scale_modifier)
    # guard z for culled points so the clamped-projection math stays finite
    safe_view = jnp.where(in_front[..., None],
                          p_view, jnp.asarray([0.0, 0.0, 1.0], p_view.dtype))
    c2 = project_cov3d_to_2d(
        safe_view, cov3d, settings.viewmatrix,
        settings.focal_x, settings.focal_y, settings.tanfovx, settings.tanfovy)

    radius = c2.radius
    # exact AABB of the 3-sigma ellipse: lambda_max >= max(cov_xx, cov_yy),
    # so these per-axis extents are always <= the isotropic radius
    extent = 3.0 * jnp.sqrt(jnp.maximum(c2.cov[..., 0::2], 0.0))
    # opacity-aware support: alpha = op*exp(-q/2) can only clear the 1/255
    # compositing gate (composite.py ALPHA_MIN == forward.cu:358) where
    # q <= 2*ln(255*op); the 3-sigma rect is q <= 9. Shrinking the rect to
    # the true support is LOSSLESS — every excluded pixel is zeroed by the
    # alpha gate in all three tiers (and gets exactly zero gradient) — and
    # cuts the duplicated-instance count every pipeline stage scales with.
    # +1e-3 q-slack: the compositors evaluate q through the conic (the
    # inverse covariance) while this bound uses the covariance directly;
    # the slack keeps any pixel whose f32 alpha still clears the gate
    # inside the rect. stop_gradient: the support bound is integer
    # plumbing, not a differentiable quantity.
    q_max = 2.0 * jnp.log(255.0 * jnp.maximum(opacities, 1e-30)) + 1e-3
    shrink = jax.lax.stop_gradient(
        jnp.sqrt(jnp.clip(q_max, 0.0, 9.0) / 9.0))
    extent = extent * shrink[..., None]
    # a gaussian whose PEAK alpha (= op, before the 0.99 clamp) is below
    # the gate contributes nothing at any pixel; the 1e-5 margin keeps
    # borderline ones alive against the kernel's log/exp round-trip
    alive_op = opacities * 255.0 >= 1.0 - 1e-5
    rect_min, rect_max = get_rect(mean2d, extent, settings.grid_x, settings.grid_y)
    tiles = ((rect_max[..., 0] - rect_min[..., 0])
             * (rect_max[..., 1] - rect_min[..., 1]))

    visible = in_front & (c2.det != 0.0) & (tiles > 0) & alive_op
    if active_mask is not None:
        visible = visible & active_mask
    radius = jnp.where(visible, radius, 0.0)
    tiles_touched = jnp.where(visible, tiles, 0).astype(jnp.int32)

    if colors_precomp is not None:
        rgb = colors_precomp
    elif shs is not None:
        rgb, _ = sh_lib.eval_sh_color(settings.sh_degree, shs, means3d,
                                      settings.campos)
    else:
        rgb = jnp.zeros(means3d.shape[:-1] + (3,), dtype=means3d.dtype)

    return Preprocessed(
        mean2d=mean2d,
        depth=p_view[..., 2],
        conic=c2.conic,
        opacity=opacities,
        rgb=rgb,
        radii=radius,
        extent=extent,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
        visible=visible,
    )


def mark_visible(means3d: jnp.ndarray, viewmatrix: jnp.ndarray,
                 projmatrix: jnp.ndarray) -> jnp.ndarray:
    """GaussianRasterizer.markVisible analog
    (diff_gaussian_rasterization/__init__.py:199-208): frustum-only test."""
    p_view = transform_point_4x3(means3d, viewmatrix)
    return p_view[..., 2] > 0.2
