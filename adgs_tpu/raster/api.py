"""Public rasterizer API.

`rasterize(...)` plays the role of GaussianRasterizer.forward
(diff_gaussian_rasterization/__init__.py:210-251): 10 differentiable inputs
-> 6 render targets. Backend selection:

  - "reference": naive O(N*pix) oracle (tiny scenes, ground truth)
  - "xla":       tiled scan path (portable, differentiable by autodiff)
  - "pallas":    hand-scheduled TPU kernels with custom VJP (fastest)

Capacity knobs replace the reference's data-dependent allocations
(rasterizer_impl.cu:284-305): `capacity` bounds total duplicated instances,
`max_per_tile` bounds each tile's depth list in the tiled paths. Both are
static (jit-stable); overflow is surfaced in Binning, and callers size them
with `binning.required_capacity`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from . import binning as binning_lib
from . import preprocess as prep_lib
from . import reference as reference_lib
from . import tiled as tiled_lib
from .types import RasterSettings, RasterOutput


def resolve_backend(backend: str) -> str:
    """"auto" picks the Mosaic kernel tier on TPU and the portable XLA
    scan tier elsewhere (the Pallas kernels only run interpreted off-TPU,
    which is a test vehicle, not a production path)."""
    if backend == "auto":
        import jax
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def rasterize(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    settings: RasterSettings,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    flow_points: Optional[jnp.ndarray] = None,
    semantic: Optional[jnp.ndarray] = None,
    screen_offset: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    capacity: int = 1 << 18,
    max_per_tile: int = 2048,
    chunk: int = 32,
    precomputed_binning=None,
) -> RasterOutput:
    """precomputed_binning: a Binning from `compute_binning` for the SAME
    geometry — lets callers jit the (non-differentiable) sort pipeline
    separately from the differentiable render, which keeps compile time
    bounded on TPU."""
    if shs is None and colors_precomp is None:
        raise ValueError("either shs or colors_precomp is required")
    backend = resolve_backend(backend)

    prep = prep_lib.preprocess(
        means3d, scales, rotations, opacities, shs, settings,
        colors_precomp=colors_precomp, screen_offset=screen_offset,
        active_mask=active_mask)

    if backend == "reference":
        return reference_lib.composite_reference(
            prep, settings, flow_points=flow_points, semantic=semantic)

    if precomputed_binning is not None:
        binning = precomputed_binning
    else:
        binning = binning_lib.bin_gaussians(prep, settings, capacity=capacity)

    if backend == "xla":
        max_chunks = -(-max_per_tile // chunk)
        return tiled_lib.render_tiled(
            prep, binning, settings, flow_points=flow_points,
            semantic=semantic, max_chunks=max_chunks, chunk=chunk)
    if backend == "pallas":
        from .pallas import render as pallas_render
        return pallas_render.render_pallas(
            prep, binning, settings, flow_points=flow_points,
            semantic=semantic)
    raise ValueError(f"unknown backend: {backend}")
