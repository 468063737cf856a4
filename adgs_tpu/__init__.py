"""adgs_tpu: TPU-native object-aware dynamic Gaussian splatting for driving scenes.

A from-scratch JAX/XLA/Pallas framework with the capabilities of AD-GS
(ICCV 2025): differentiable tile-based Gaussian splatting with depth /
accumulated-opacity / optical-flow / semantic render targets, object-aware
B-spline temporal deformation, a learnable equirectangular environment map,
densification, and the full self-supervised training recipe on KITTI-MOT,
Waymo and nuScenes scenes — sharded over TPU meshes.

Layering (bottom-up):
  core/      pure math: SH, quaternions, covariances, cameras, temporal splines
  raster/    the differentiable renderer: preprocess -> binning -> compositing
             (reference jnp oracle + production tiled path + Pallas kernels)
  models/    Gaussian parameter pytrees (capacity-padded), environment map
  ops/       KNN, SSIM, depth/flow ops
  train/     losses, optimizer, train step, densification, checkpointing
  data/      scene readers (KITTI/Waymo/nuScenes npz+PLY contracts), PLY IO
  parallel/  mesh setup + shard_map tile/primitive sharding
  cli/       train/render entry points
"""

__version__ = "0.1.0"
