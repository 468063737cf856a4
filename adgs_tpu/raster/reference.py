"""Naive O(N * pixels) reference renderer — the parity oracle.

Reproduces the exact semantics of the tiled CUDA pipeline
(rasterizer_impl.cu:198-352) without tiling: every pixel considers every
visible Gaussian in global depth order, masked by "does this Gaussian's tile
rect cover my tile" — which is precisely the set of contributions the tiled
renderer composites (a Gaussian reaches a pixel iff the pixel's tile is in
its rect, and per-tile depth order == global depth order restricted to the
tile's subset; the radix sort is stable so ties fall back to Gaussian index
order in both).

Fully differentiable; used as ground truth for images AND gradients of the
production tiled/Pallas paths on small scenes. Memory is O(N * pixels) —
tiny scenes only.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from . import composite
from .preprocess import Preprocessed
from .types import RasterSettings, RasterOutput, TILE_X, TILE_Y


def composite_reference(prep: Preprocessed, settings: RasterSettings,
                        flow_points: Optional[jnp.ndarray] = None,
                        semantic: Optional[jnp.ndarray] = None) -> RasterOutput:
    H, W = settings.image_height, settings.image_width
    N = prep.depth.shape[0]

    # Global front-to-back order; culled Gaussians sink to the end.
    sort_key = jnp.where(prep.visible, prep.depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)

    mean2d = prep.mean2d[order]
    conic = prep.conic[order]
    opac = jnp.where(prep.visible, prep.opacity, 0.0)[order]
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]

    # Pixel centers (the CUDA kernel uses integer pixel coords as floats)
    px = jnp.arange(W, dtype=jnp.float32)
    py = jnp.arange(H, dtype=jnp.float32)
    pix_x = jnp.broadcast_to(px[None, :], (H, W)).reshape(-1)
    pix_y = jnp.broadcast_to(py[:, None], (H, W)).reshape(-1)
    tile_x = (pix_x // TILE_X).astype(jnp.int32)
    tile_y = (pix_y // TILE_Y).astype(jnp.int32)

    # [P, N] alpha with rect-coverage gating
    dx = mean2d[None, :, 0] - pix_x[:, None]
    dy = mean2d[None, :, 1] - pix_y[:, None]
    delta = jnp.stack([dx, dy], axis=-1)
    alpha = composite.gaussian_alpha(conic[None, :, :], opac[None, :], delta)
    covered = (
        (tile_x[:, None] >= rect_min[None, :, 0])
        & (tile_x[:, None] < rect_max[None, :, 0])
        & (tile_y[:, None] >= rect_min[None, :, 1])
        & (tile_y[:, None] < rect_max[None, :, 1])
    )
    alpha = jnp.where(covered, alpha, 0.0)

    bw = composite.blend_weights(alpha)  # along N axis

    feats = [prep.rgb[order],
             composite.depth_feature(prep.depth, settings.inv_depth)[order][:, None]]
    if flow_points is not None:
        feats.append(flow_points[order])
    if semantic is not None:
        feats.append(semantic[order])
    features = jnp.concatenate(feats, axis=-1)  # [N, CH]

    blended = bw.weights @ features  # [P, CH]
    t_final = bw.t_eff

    color = blended[:, :3] + t_final[:, None] * settings.bg[None, :]
    depth = blended[:, 3]
    ch = 4
    flow_img = None
    if flow_points is not None:
        flow_img = blended[:, ch:ch + 3].reshape(H, W, 3).transpose(2, 0, 1)
        ch += 3
    sem_img = None
    if semantic is not None:
        S = semantic.shape[-1]
        sem_img = blended[:, ch:ch + S].reshape(H, W, S).transpose(2, 0, 1)

    return RasterOutput(
        color=color.reshape(H, W, 3).transpose(2, 0, 1),
        radii=prep.radii.astype(jnp.int32),
        depth=depth.reshape(1, H, W),
        opacity=(1.0 - t_final).reshape(1, H, W),
        flow=flow_img,
        semantic=sem_img,
    )
