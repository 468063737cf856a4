"""K-nearest-neighbor ops.

Replaces the two CUDA KNN dependencies of the reference:
  - simple_knn._C.distCUDA2 (submodules/simple-knn/simple_knn.cu:45-221):
    mean squared distance to the 3 nearest neighbors, used ONCE to set
    initial log-scales (scene/gaussian_model.py:277-278). The CUDA version
    is an approximate Morton-bucketed search; ours is EXACT:
    scipy cKDTree on host (init-time only, not in the train step).
  - pytorch3d.ops.knn_points (scene/gaussian_model.py:833): K neighbors of
    random anchors among object Gaussians, refreshed every few iterations
    host-side for the trajectory-variance regularizers.

A jittable on-device variant (`knn_indices_device`) is provided for use
inside compiled steps: Morton-code sort + windowed candidate search — the
same bucketing idea as simple-knn, fully vectorized (gather + top-k).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from scipy.spatial import cKDTree
    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


def mean_knn_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean SQUARED distance to the k nearest neighbors (excluding self).

    distCUDA2 parity (spatial.cu:15-26): used for init scales."""
    points = np.asarray(points, dtype=np.float64)
    n = points.shape[0]
    if n <= 1:
        return np.full((n,), 1e-6, dtype=np.float32)
    kk = min(k, n - 1)
    if _HAVE_SCIPY:
        tree = cKDTree(points)
        d, _ = tree.query(points, k=kk + 1)
        d2 = d[:, 1:] ** 2
    else:  # brute force fallback
        diff = points[:, None, :] - points[None, :, :]
        dist2 = np.sum(diff * diff, axis=-1)
        np.fill_diagonal(dist2, np.inf)
        d2 = np.sort(dist2, axis=1)[:, :kk]
    return d2.mean(axis=1).astype(np.float32)


def knn_indices(anchors: np.ndarray, points: np.ndarray, k: int) -> np.ndarray:
    """[A, k] indices of the k nearest points to each anchor (host-side,
    exact — pytorch3d knn_points.idx parity)."""
    anchors = np.asarray(anchors, dtype=np.float64)
    points = np.asarray(points, dtype=np.float64)
    kk = min(k, points.shape[0])
    if _HAVE_SCIPY:
        tree = cKDTree(points)
        _, idx = tree.query(anchors, k=kk)
        idx = np.atleast_2d(idx)
        if idx.ndim == 1:
            idx = idx[:, None]
    else:
        diff = anchors[:, None, :] - points[None, :, :]
        dist2 = np.sum(diff * diff, axis=-1)
        idx = np.argsort(dist2, axis=1)[:, :kk]
    if kk < k:  # pad by repeating the nearest
        idx = np.concatenate([idx] + [idx[:, :1]] * (k - kk), axis=1)
    return idx.astype(np.int32)


def _morton_interleave(q: jnp.ndarray) -> jnp.ndarray:
    """[N,3] uint32 10-bit coords -> [N] 30-bit Morton codes
    (same spatial hashing as simple_knn.cu:45-70)."""
    def spread(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2))


def knn_indices_device(anchors: jnp.ndarray, points: jnp.ndarray, k: int,
                       window: int = 64) -> jnp.ndarray:
    """Approximate on-device KNN: Morton-sort the points, locate each anchor
    in the sorted order, examine a +-window slice, exact top-k within it.

    Jittable; used when the KNN refresh must live inside a compiled step.
    [A, k] int32 indices into `points`."""
    n = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((points - lo) * scale), 0, 1023).astype(jnp.uint32)
    codes = _morton_interleave(q)
    order = jnp.argsort(codes)
    sorted_pts = points[order]
    sorted_codes = codes[order]

    qa = jnp.clip(((anchors - lo) * scale), 0, 1023).astype(jnp.uint32)
    a_codes = _morton_interleave(qa)
    pos = jnp.searchsorted(sorted_codes, a_codes)

    offs = jnp.arange(-window, window + 1, dtype=jnp.int32)
    cand = jnp.clip(pos[:, None] + offs[None, :], 0, n - 1)   # [A, 2w+1]
    cpts = sorted_pts[cand]                                   # [A, 2w+1, 3]
    d2 = jnp.sum((cpts - anchors[:, None, :]) ** 2, axis=-1)
    _, top = jax.lax.top_k(-d2, k)                            # nearest k
    return order[jnp.take_along_axis(cand, top, axis=1)]


@functools.partial(jax.jit, static_argnames=("k", "a_cap", "window"))
def near_idx_device(pts: jnp.ndarray, alive: jnp.ndarray,
                    key: jnp.ndarray, k: int, a_cap: int,
                    window: int = 64):
    """On-device set_obj_near_idx (gaussian_model.py:825-833): random alive
    anchors, approximate Morton-window KNN over the padded point cloud.

    pts: [N, D>=3] padded (dead rows arbitrary); alive: [N] bool.
    Returns (idx [a_cap, k] int32 padded-slot indices, valid [a_cap] bool).
    Replaces the host cKDTree refresh (device pull + O(N log N) host work
    every near_idx_reset_interval iters) with a fully-compiled program; the
    neighbor sets are approximate (window-local in Morton order) — the
    group-variance losses they feed are statistical regularizers over
    random anchors, not exact-geometry terms."""
    N, D = pts.shape
    alive_col = alive[:, None]
    lo = jnp.min(jnp.where(alive_col, pts, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(alive_col, pts, -jnp.inf), axis=0)
    span = jnp.maximum(hi - lo, 1e-9)
    # dead slots move to a far corner: they Morton-sort after every alive
    # point and lose every top-k by distance
    pts_m = jnp.where(alive_col, pts, hi + span)
    n_alive = jnp.sum(alive.astype(jnp.int32))

    r = jax.random.uniform(key, (N,))
    pri = jnp.where(alive, r, jnp.inf)
    anchor_slot = jnp.argsort(pri)[:a_cap]          # random alive slots
    anchors = pts_m[anchor_slot]
    idx = knn_indices_device(anchors, pts_m, k, window=window)
    n_anchor = jnp.maximum(n_alive // k, 1)
    valid = (jnp.arange(a_cap, dtype=jnp.int32) < n_anchor) & (n_alive >= k)
    # invalid anchors keep index 0 rows (harmless — gated by `valid`)
    idx = jnp.where(valid[:, None], idx, 0)
    return idx.astype(jnp.int32), valid
