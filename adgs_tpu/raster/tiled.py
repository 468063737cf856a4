"""Tiled compositing in pure XLA: a scan over fixed-size instance chunks.

Production-correct differentiable path (the Pallas kernels in
raster/pallas/ are the performance tier; this is the portable tier and the
multi-device shard_map payload). Per scan step, every tile gathers one
CHUNK of its sorted instance range and blends it with the closed-form
weights of raster/composite.py; the feature accumulation is one batched
[P, CHUNK] @ [CHUNK, CH] matmul per tile — MXU work. `jax.checkpoint` on
the body keeps autodiff memory at O(carry) instead of O(steps).

Semantics parity: forward.cu:261-402 (see composite.py for the gate
derivation); the backward produced by autodiff matches backward.cu:417-646
as deterministic segment reductions instead of atomics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import composite
from .binning import Binning
from .preprocess import Preprocessed
from .types import RasterSettings, RasterOutput, TILE_X, TILE_Y, TILE_PIX


def _tile_pixel_coords(settings: RasterSettings):
    """[T, P] absolute pixel x/y for every tile's pixels."""
    gx, gy = settings.grid_x, settings.grid_y
    tx = jnp.arange(gx, dtype=jnp.float32) * TILE_X
    ty = jnp.arange(gy, dtype=jnp.float32) * TILE_Y
    # tile-local pixel offsets
    ox = jnp.tile(jnp.arange(TILE_X, dtype=jnp.float32), (TILE_Y,))
    oy = jnp.repeat(jnp.arange(TILE_Y, dtype=jnp.float32), TILE_X)
    # tiles are indexed row-major: tile = ty * gx + tx
    px = (tx[None, :, None] + ox[None, None, :])  # [1, gx, P]
    py = (ty[:, None, None] + oy[None, None, :])  # [gy, 1, P]
    px = jnp.broadcast_to(px, (gy, gx, TILE_PIX)).reshape(-1, TILE_PIX)
    py = jnp.broadcast_to(py, (gy, gx, TILE_PIX)).reshape(-1, TILE_PIX)
    return px, py


def tiles_to_image(tile_px: jnp.ndarray, settings: RasterSettings) -> jnp.ndarray:
    """[T, P, CH] -> [CH, H, W] (crops the tile padding)."""
    gy, gx = settings.grid_y, settings.grid_x
    ch = tile_px.shape[-1]
    img = tile_px.reshape(gy, gx, TILE_Y, TILE_X, ch)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * TILE_Y, gx * TILE_X, ch)
    img = img[: settings.image_height, : settings.image_width]
    return img.transpose(2, 0, 1)


class TiledImages(NamedTuple):
    blended: jnp.ndarray  # [T, P, CH] feature accumulation (no background)
    final_t: jnp.ndarray  # [T, P]


def composite_tiles(
    binning: Binning,
    mean2d: jnp.ndarray,    # [N,2]
    conic: jnp.ndarray,     # [N,3]
    opacity: jnp.ndarray,   # [N]
    features: jnp.ndarray,  # [N,CH]
    settings: RasterSettings,
    max_chunks: int,
    chunk: int = 32,
) -> TiledImages:
    """Blend all tiles. max_chunks * chunk bounds the instances considered
    per tile (instances beyond are dropped — size via binning.tile_count)."""
    T = settings.num_tiles
    CH = features.shape[-1]
    if mean2d.shape[0] == 0:
        return TiledImages(
            blended=jnp.zeros((T, TILE_PIX, CH), dtype=jnp.float32),
            final_t=jnp.ones((T, TILE_PIX), dtype=jnp.float32))
    px, py = _tile_pixel_coords(settings)

    gauss_id = jax.lax.stop_gradient(binning.gauss_id)
    tile_start = jax.lax.stop_gradient(binning.tile_start)
    tile_count = jax.lax.stop_gradient(binning.tile_count)
    R = gauss_id.shape[0]

    def body(carry, step):
        t_raw, t_eff, accum = carry
        base = step * chunk
        # [T, chunk] sorted-instance slots for this chunk of every tile
        idx = tile_start[:, None] + base + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_range = (base + jnp.arange(chunk, dtype=jnp.int32)[None, :]
                    < tile_count[:, None])
        idx = jnp.clip(idx, 0, R - 1)
        gid = gauss_id[idx]                       # [T, chunk]

        m2d = mean2d[gid]                         # [T, chunk, 2]
        con = conic[gid]                          # [T, chunk, 3]
        opa = jnp.where(in_range, opacity[gid], 0.0)
        fea = features[gid]                       # [T, chunk, CH]

        # [T, P, chunk] deltas
        dx = m2d[:, None, :, 0] - px[:, :, None]
        dy = m2d[:, None, :, 1] - py[:, :, None]
        delta = jnp.stack([dx, dy], axis=-1)
        alpha = composite.gaussian_alpha(
            con[:, None, :, :], opa[:, None, :], delta)

        bw = composite.blend_weights(alpha, t_raw, t_eff)
        accum = accum + jnp.einsum("tpc,tcf->tpf", bw.weights, fea,
                                   preferred_element_type=jnp.float32,
                                   precision="highest")
        return (bw.t_raw, bw.t_eff, accum), None

    init = (
        jnp.ones((T, TILE_PIX), dtype=jnp.float32),
        jnp.ones((T, TILE_PIX), dtype=jnp.float32),
        jnp.zeros((T, TILE_PIX, CH), dtype=jnp.float32),
    )
    (t_raw, t_eff, accum), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(max_chunks, dtype=jnp.int32))
    return TiledImages(blended=accum, final_t=t_eff)


def render_tiled(
    prep: Preprocessed,
    binning: Binning,
    settings: RasterSettings,
    flow_points: Optional[jnp.ndarray] = None,
    semantic: Optional[jnp.ndarray] = None,
    max_chunks: int = 64,
    chunk: int = 32,
) -> RasterOutput:
    feats = [prep.rgb,
             composite.depth_feature(prep.depth, settings.inv_depth)[:, None]]
    if flow_points is not None:
        feats.append(flow_points)
    if semantic is not None:
        feats.append(semantic)
    features = jnp.concatenate(feats, axis=-1)

    opac = jnp.where(prep.visible, prep.opacity, 0.0)
    out = composite_tiles(binning, prep.mean2d, prep.conic, opac, features,
                          settings, max_chunks=max_chunks, chunk=chunk)

    color_t = out.blended[..., :3] + out.final_t[..., None] * settings.bg
    depth_t = out.blended[..., 3:4]
    ch = 4
    flow_img = sem_img = None
    color = tiles_to_image(color_t, settings)
    depth = tiles_to_image(depth_t, settings)
    opacity = tiles_to_image(1.0 - out.final_t[..., None], settings)
    if flow_points is not None:
        flow_img = tiles_to_image(out.blended[..., ch:ch + 3], settings)
        ch += 3
    if semantic is not None:
        S = semantic.shape[-1]
        sem_img = tiles_to_image(out.blended[..., ch:ch + S], settings)

    return RasterOutput(
        color=color,
        radii=prep.radii.astype(jnp.int32),
        depth=depth,
        opacity=opacity,
        flow=flow_img,
        semantic=sem_img,
    )
