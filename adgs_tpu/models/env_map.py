"""Learnable equirectangular environment (sky) map.

Capability parity with scene/env.py (EnvironmentMap, 101 LoC):
  - an [1, C, R, R] learnable grid sampled by (azimuth, elevation) with
    bilinear interpolation + sigmoid (:67-76). torch grid_sample with
    align_corners=True becomes an explicit gather-lerp (`_grid_sample`)
    with a hand-written flat scatter-add backward (custom_vjp below —
    2.8x the autodiff scatter's speed at the 8192^2 grid).
  - per-camera ray caching (:44-65) happens host-side in `camera_rays`
    (pure function of intrinsics; callers memoize by cam_id).
  - K uses width/2, height/2 centers and rays are normalized camera-space
    directions rotated into world by the TRANSPOSED-stored view matrix's
    upper 3x3 (scene/env.py:59-61 — that matrix is already the cam->world
    rotation in math convention).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def camera_rays(focal: float, height: int, width: int) -> np.ndarray:
    """[H, W, 3] unit camera-space rays (scene/env.py:11-26)."""
    xs = np.arange(width, dtype=np.float32)
    ys = np.arange(height, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)  # indexing='xy'
    x = (gx - width / 2.0) / focal
    y = (gy - height / 2.0) / focal
    rays = np.stack([x, y, np.ones_like(x)], axis=-1)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    return rays


def direction_to_angles(view: jnp.ndarray) -> jnp.ndarray:
    """[-pi,pi] azimuth x [-pi/2,pi/2] elevation
    (utils/graphics_utils.py:96-100 vector_to_theta)."""
    x, y, z = view[..., 0], view[..., 1], view[..., 2]
    hxy = jnp.hypot(x, y)
    el = jnp.arctan2(z, hxy)
    az = jnp.arctan2(y, x)
    return jnp.stack([az, el], axis=-1)


def angles_to_direction(angles: jnp.ndarray) -> jnp.ndarray:
    """utils/graphics_utils.py:88-94 theta_to_vector."""
    az, el = angles[..., 0], angles[..., 1]
    return jnp.stack([jnp.cos(az) * jnp.cos(el),
                      jnp.sin(az) * jnp.cos(el),
                      jnp.sin(el)], axis=-1)


def _taps(grid_shape, coords):
    """Bilinear tap indices/weights for [-1,1] coords with torch
    grid_sample(align_corners=True, padding_mode='zeros') semantics.
    Returns ((xi, yi, w) x 4) with w = 0 for out-of-bounds taps."""
    _, Hg, Wg = grid_shape
    x = (coords[..., 0] + 1.0) * 0.5 * (Wg - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (Hg - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    out = []
    for xi, yi, w in ((x0, y0, (1 - wx) * (1 - wy)),
                      (x0 + 1, y0, wx * (1 - wy)),
                      (x0, y0 + 1, (1 - wx) * wy),
                      (x0 + 1, y0 + 1, wx * wy)):
        inb = (xi >= 0) & (xi <= Wg - 1) & (yi >= 0) & (yi <= Hg - 1)
        out.append((jnp.clip(xi, 0, Wg - 1).astype(jnp.int32),
                    jnp.clip(yi, 0, Hg - 1).astype(jnp.int32),
                    jnp.where(inb, w, 0.0)))
    return out


@jax.custom_vjp
def _grid_sample_align_corners(grid: jnp.ndarray, coords: jnp.ndarray
                               ) -> jnp.ndarray:
    """Bilinear sample of [C, Hg, Wg] at [..., 2] (x, y) in [-1, 1] with
    torch grid_sample(align_corners=True, padding_mode='zeros') semantics.

    custom_vjp: the autodiff backward is four unsorted 2D scatter-adds
    into the full grid (~170ms/frame at the 8192^2 production resolution,
    exp/lab_env.py); the hand backward flattens cell ids and runs one 1D
    scatter-add per channel (~60ms). Coords are treated as
    NON-differentiable (zero cotangent): every caller feeds camera rays,
    which are constants — matching the reference, where ray grids are
    never optimizer leaves (scene/env.py:44-65)."""
    v = 0.0
    for xi, yi, w in _taps(grid.shape, coords):
        # out-of-bounds taps carry w == 0, so the clipped-index value
        # is annihilated (padding_mode='zeros')
        v = v + grid[:, yi, xi] * w[None]
    return v


def _grid_sample_fwd(grid, coords):
    return _grid_sample_align_corners(grid, coords), (grid.shape, coords)


def _grid_sample_bwd(res, g):
    grid_shape, coords = res
    C, Hg, Wg = grid_shape
    flat = coords.reshape(-1, 2)
    gf = g.reshape(C, -1)
    taps = _taps(grid_shape, flat)
    ids4 = jnp.concatenate([yi * Wg + xi for xi, yi, _ in taps])
    # per-channel 1D scatter: a [cells, C] layout would lane-pad C -> 128
    # (34GB at 8192^2) and minor-axis [C, cells] scatters measure 2.8x
    # slower than flat per-channel ones (exp/lab_env.py)
    chans = []
    for c in range(C):
        vals4 = jnp.concatenate([gf[c] * w for _, _, w in taps])
        chans.append(jnp.zeros((Hg * Wg,), g.dtype).at[ids4].add(vals4))
    d_grid = jnp.stack(chans).reshape(C, Hg, Wg)
    return d_grid, jnp.zeros_like(coords)


_grid_sample_align_corners.defvjp(_grid_sample_fwd, _grid_sample_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvironmentMap:
    grid: jnp.ndarray  # [C, R, R] learnable

    @classmethod
    def create(cls, resolution: int, num_channel: int = 3,
               seed: int = 0) -> "EnvironmentMap":
        """scene/env.py:30-35: U(-1,1) * 1e-4 init."""
        rng = np.random.default_rng(seed)
        g = (rng.random((num_channel, resolution, resolution),
                        dtype=np.float32) * 2.0 - 1.0) * 1e-4
        return cls(grid=jnp.asarray(g))

    def color(self, view: jnp.ndarray, input_angle: bool = False) -> jnp.ndarray:
        """get_env_color (scene/env.py:67-76): dirs [..., 3] -> [C, ...]."""
        if not input_angle:
            view = view / jnp.maximum(
                jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12)
            angles = direction_to_angles(view)
        else:
            angles = view
        scale = jnp.asarray([1.0 / jnp.pi, 2.0 / jnp.pi], dtype=jnp.float32)
        coords = angles * scale
        if coords.ndim == 3:
            # image-shaped [H, W, 2] coords ride the blocked Pallas
            # sample/scatter (ops/grid_sample.py) — ~10x over the generic
            # gather/scatter at the 8192^2 production grid
            from ..ops.grid_sample import grid_sample_image
            return jax.nn.sigmoid(grid_sample_image(self.grid, coords))
        return jax.nn.sigmoid(_grid_sample_align_corners(self.grid, coords))

    def image_background(self, cam_rays: jnp.ndarray,
                         world_view: jnp.ndarray) -> jnp.ndarray:
        """get_image_background (scene/env.py:44-65): [H, W, 3] camera rays +
        transposed-stored view matrix -> [C, H, W] sky image."""
        world_rays = jnp.matmul(cam_rays, world_view[:3, :3].T,
                                precision="highest")
        return self.color(world_rays)
