"""Device mesh construction."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize (auto-detected on
    TPU pods; explicit args for manual launch). Call before make_mesh on
    every host; collectives then ride ICI within a slice and DCN across
    slices. No-op if already initialized."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def make_mesh(axis_sizes: Optional[dict[str, int]] = None) -> Mesh:
    """Build a mesh over all available devices.

    Default: 1D mesh over axis "tile" (image-tile sharding). Pass e.g.
    {"data": 2, "tile": 4} for camera-batch data parallelism x tile
    sharding. Multi-host: call jax.distributed.initialize() first; this
    uses the global device list."""
    devices = np.asarray(jax.devices())
    if axis_sizes is None:
        axis_sizes = {"tile": devices.size}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    if int(np.prod(sizes)) != devices.size:
        raise ValueError(f"mesh {axis_sizes} != {devices.size} devices")
    return Mesh(devices.reshape(sizes), names)
