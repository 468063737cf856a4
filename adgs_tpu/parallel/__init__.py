"""Multi-device execution: mesh setup and tile-sharded rendering/training.

The reference is strictly single-GPU (SURVEY.md §2.3) — this subsystem is
new TPU-native scope: image tiles are sharded across a mesh axis, each
device rasterizes its tile-row slab, final images are all-gathered for the
(cheap, global) loss, and parameter gradients are combined by shard_map's
transpose (a psum over the replicated-parameter cotangents) riding ICI.
"""

from .mesh import make_mesh  # noqa: F401
from .shard import make_sharded_train_step, sharded_render_color  # noqa: F401
