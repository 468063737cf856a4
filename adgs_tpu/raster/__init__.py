"""Differentiable tile-based Gaussian rasterizer (TPU-native).

Pipeline (mirrors the reference CUDA stages, re-architected for XLA/Pallas):

  preprocess  (jnp, differentiable)  — project, EWA cov2D, conic, radii,
                                       tile rects, SH->RGB; forward.cu:156-256
  binning     (jnp, integer/sort)    — instance expansion + (tile, depth) sort
                                       + tile ranges; rasterizer_impl.cu:70-138
  composite   (XLA scan or Pallas)   — front-to-back alpha blending with
                                       color/depth/flow/semantic targets;
                                       forward.cu:261-402 / backward.cu:417-646

The naive `reference` renderer (raster/reference.py) reproduces the exact
per-pixel semantics in O(N * pixels) and is the parity oracle for the tiled
paths.
"""

from .types import RasterSettings, RasterOutput  # noqa: F401
from .api import rasterize  # noqa: F401
