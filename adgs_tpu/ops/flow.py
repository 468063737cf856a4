"""Optical-flow pseudo-label loss: project blended 3D flow points with the
flow package's (K, R, T) and compare to tracked pixel targets.

Parity: utils/flow_utils.py:5-10 (flow_points_project) and
utils/loss_utils.py:86-106 (get_flow_loss). The reference gathers the
nonzero visible coordinates (data-dependent shapes); here the selection is
mask arithmetic at full [H, W] shape — identical value, jit-stable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FlowPackage(NamedTuple):
    """One flow supervision target (dataset_readers.py:170-200 contract)."""

    time: jnp.ndarray      # scalar: the tracked frame's time
    K: jnp.ndarray         # [3,3] intrinsics
    R: jnp.ndarray         # [3,3] world->cam
    T: jnp.ndarray         # [3] translation
    flow: jnp.ndarray      # [2,H,W] target pixel coords at `time`
    vis: jnp.ndarray       # [H,W] visibility in {0,1}


def flow_points_project(pts: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray,
                        T: jnp.ndarray, dist: float = 1e-3):
    """[N,3] world -> ([N,2] pixels, [N] in-front mask)."""
    mm = lambda a, b: jnp.matmul(a, b, precision="highest")  # noqa: E731
    proj = mm(mm(pts, R.T) + T, K.T)
    mask = proj[..., 2] > dist
    uv = proj[..., :2] / jnp.maximum(proj[..., 2:3], dist)
    return uv, mask


def flow_loss_sums(img_flow: jnp.ndarray, flow_img: jnp.ndarray,
                   vis_img: jnp.ndarray, K, R, T,
                   img_opacity: jnp.ndarray | None = None,
                   dist: float = 1e-3,
                   full_hw: tuple[int, int] | None = None,
                   pix_mask: jnp.ndarray | None = None):
    """Per-pixel decomposition of flow_loss: (err_sum, vis_count).

    Every term is pixel-local, so slab-sharded callers psum the two sums
    and divide once. full_hw: the FULL image (H, W) used for the axis
    normalization and bounds (the slab may be a row slice of it);
    pix_mask: [h,w] validity of this region's pixels (row padding)."""
    H, W = full_hw if full_hw is not None else flow_img.shape[1:]
    vis = ((vis_img > 0.5)
           & (flow_img[0] <= W - 1.0) & (flow_img[0] >= 0.0)
           & (flow_img[1] <= H - 1.0) & (flow_img[1] >= 0.0))
    if pix_mask is not None:
        vis = vis & (pix_mask > 0)
    count = jnp.sum(vis)
    weight = vis.astype(img_flow.dtype)
    if img_opacity is not None:
        weight = weight * img_opacity

    pts = img_flow.reshape(3, -1).T                      # [hw, 3]
    uv, front = flow_points_project(pts, K, R, T, dist)
    weight = weight.reshape(-1) * front.astype(weight.dtype)

    target = flow_img.reshape(2, -1).T                   # [hw, 2]
    err = jnp.abs(uv - target) * weight[:, None]
    err = err.at[:, 0].divide(W).at[:, 1].divide(H)
    return jnp.sum(err), count


def flow_loss(img_flow: jnp.ndarray, pkg: FlowPackage,
              img_opacity: jnp.ndarray | None = None,
              dist: float = 1e-3) -> jnp.ndarray:
    """get_flow_loss (utils/loss_utils.py:86-106).

    img_flow: [3,H,W] blended 3D flow points; pkg.flow: [2,H,W] targets.
    Weighted per-pixel by visibility (and rendered opacity), axes normalized
    by W and H, mean over the SELECTED pixels."""
    total, count = flow_loss_sums(img_flow, pkg.flow, pkg.vis,
                                  pkg.K, pkg.R, pkg.T, img_opacity, dist)
    total = total / jnp.maximum(count, 1)
    return jnp.where(count > 0, total, 0.0)


def image_flow(img_flow: jnp.ndarray, pkg: FlowPackage, dist: float = 1e-3
               ) -> jnp.ndarray:
    """get_img_flow (utils/flow_utils.py:12-31): projected flow image for
    visualization, with the identity grid where not tracked."""
    H, W = pkg.flow.shape[1:]
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    grid = jnp.stack([gx, gy], axis=-1)
    vis = ((pkg.vis > 0.5)
           & (pkg.flow[0] <= W - 1.0) & (pkg.flow[0] >= 0.0)
           & (pkg.flow[1] <= H - 1.0) & (pkg.flow[1] >= 0.0))
    pts = img_flow.reshape(3, -1).T
    uv, front = flow_points_project(pts, pkg.K, pkg.R, pkg.T, dist)
    sel = (vis.reshape(-1) & front)[:, None]
    out = jnp.where(sel, uv, grid.reshape(-1, 2))
    return out.reshape(H, W, 2).transpose(2, 0, 1)
