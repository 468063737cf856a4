"""Mask -> LiDAR point-cloud object tagging.

Native equivalent of the reference's scripts/segment_pcd.py:80-177: for
each TRAIN frame in order, project the cloud's points whose timestamp
matches the frame (and which are still untagged) into the view and read the
object-id out of the frame's semantic mask with nearest-neighbour
align-corners sampling — exactly torch.nn.functional.grid_sample(...,
mode='nearest', align_corners=True) on coordinates normalized as
(px / W) * 2 - 1. Points outside the frustum (or behind the camera) read 0.
The first frame that tags a point wins; later frames only see untagged
points. This produces the per-point `obj` column the object-aware model
keys on (data/readers.py obj_id).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def nearest_sample_aligned(mask: np.ndarray, px: np.ndarray,
                           py: np.ndarray) -> np.ndarray:
    """grid_sample(mode='nearest', align_corners=True) parity for pixel
    coordinates px in [0, W), py in [0, H): normalized x = (px/W)*2-1 maps
    to index x_n * (W-1) / 2 + (W-1) / 2 = px * (W-1) / W, rounded to
    nearest."""
    H, W = mask.shape
    ix = np.rint(px * (W - 1) / W).astype(np.int64)
    iy = np.rint(py * (H - 1) / H).astype(np.int64)
    ix = np.clip(ix, 0, W - 1)
    iy = np.clip(iy, 0, H - 1)
    return mask[iy, ix]


def tag_points_one_frame(points: np.ndarray, K: np.ndarray, R: np.ndarray,
                         T: np.ndarray, semantic: np.ndarray) -> np.ndarray:
    """Object id per point for a single view (0 where out of view).

    points: [N, 3] world; K [3,3]; R [3,3], T [3] world-to-camera;
    semantic: [H, W] integer object-id map (0 = background)."""
    H, W = semantic.shape
    cam = points @ R.T + T
    uvw = cam @ K.T
    z_ok = uvw[:, 2] > 0.0
    z = np.where(z_ok, uvw[:, 2], 1.0)
    px, py = uvw[:, 0] / z, uvw[:, 1] / z
    in_view = z_ok & (px > 0.0) & (px < W) & (py > 0.0) & (py < H)
    obj = nearest_sample_aligned(semantic.astype(np.float32), px, py)
    return np.where(in_view, obj, 0.0).astype(np.float32)


def tag_object_points(points: np.ndarray, point_time: np.ndarray,
                      frame_time: Sequence[float],
                      K: np.ndarray, R: np.ndarray, T: np.ndarray,
                      semantics: Sequence[np.ndarray],
                      verbose: bool = False) -> np.ndarray:
    """Sequential first-tag-wins sweep over frames (segment_pcd.py:104-123).

    points [N, 3], point_time [N] raw timestamps; frame_time[i] must equal
    the timestamp value stored in the cloud for that frame's LiDAR points.
    K: [F, 3, 3] or [3, 3]; R/T: [F, 3, 3] / [F, 3]."""
    N = len(points)
    F = len(semantics)
    Ks = (np.broadcast_to(np.asarray(K, np.float64), (F, 3, 3))
          if np.asarray(K).ndim != 3 else np.asarray(K, np.float64))
    obj = np.zeros(N, np.float32)
    for i in range(F):
        sel = (point_time == frame_time[i]) & (obj == 0.0)
        if not np.any(sel):
            continue
        obj_i = tag_points_one_frame(points[sel], Ks[i], R[i], T[i],
                                     semantics[i])
        obj[sel] = obj_i
    if verbose:
        print(f"[segment] total {N} points, object points "
              f"{int((obj > 0).sum())}")
    return obj
