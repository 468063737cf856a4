"""Rasterizer settings and outputs.

RasterSettings mirrors GaussianRasterizationSettings
(diff_gaussian_rasterization/__init__.py:176-189) minus the torch-specific
fields; it is a frozen dataclass whose array members are pytree leaves and
whose shape-affecting members are static.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Tile size of the reference rasterizer (config.h:16-17). Binning semantics
# (which Gaussians a pixel ever sees) depend on this, so parity requires 16.
TILE_X = 16
TILE_Y = 16
TILE_PIX = TILE_X * TILE_Y


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterSettings:
    viewmatrix: jnp.ndarray   # [4,4] transposed world->view
    projmatrix: jnp.ndarray   # [4,4] transposed world->NDC
    campos: jnp.ndarray       # [3]
    bg: jnp.ndarray           # [3]

    image_height: int = dataclasses.field(metadata=dict(static=True))
    image_width: int = dataclasses.field(metadata=dict(static=True))
    tanfovx: float = dataclasses.field(metadata=dict(static=True))
    tanfovy: float = dataclasses.field(metadata=dict(static=True))
    sh_degree: int = dataclasses.field(default=3, metadata=dict(static=True))
    scale_modifier: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    inv_depth: bool = dataclasses.field(default=True, metadata=dict(static=True))
    prefiltered: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def grid_x(self) -> int:
        return (self.image_width + TILE_X - 1) // TILE_X

    @property
    def grid_y(self) -> int:
        return (self.image_height + TILE_Y - 1) // TILE_Y

    @property
    def num_tiles(self) -> int:
        return self.grid_x * self.grid_y

    @property
    def focal_x(self) -> float:
        return self.image_width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.image_height / (2.0 * self.tanfovy)


class RasterOutput(NamedTuple):
    """Render targets, matching the 6 outputs of the reference rasterizer
    (diff_gaussian_rasterization/__init__.py:230-251)."""

    color: jnp.ndarray          # [3, H, W] (bg composited with settings.bg)
    radii: jnp.ndarray          # [N] int32 screen radius (0 = culled)
    depth: jnp.ndarray          # [1, H, W] blended (inverse) depth
    opacity: jnp.ndarray        # [1, H, W] accumulated alpha (1 - final T)
    flow: Optional[jnp.ndarray]      # [3, H, W] blended flow points
    semantic: Optional[jnp.ndarray]  # [S, H, W] blended semantic channels
