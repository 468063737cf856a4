"""Quaternion algebra in (w, x, y, z) convention, VJP-safe.

Parity targets in the reference:
  - build_rotation / quaternion_multiply / quaternion log+exp:
    utils/general_utils.py:79-129
  - roma-based ops used by the cumulative quaternion B-spline
    (utils/func_utils.py:155-171): quat_conjugation, quat_product,
    unitquat_to_rotvec, rotvec_to_unitquat. roma uses (x, y, z, w); the
    reference permutes in/out of that convention. Everything here stays in
    (w, x, y, z), so there is no permutation anywhere in this framework.

Stability: log/exp maps use atan2 / sinc-style guards instead of arccos so
autodiff gradients are finite near the identity rotation.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(v: jnp.ndarray, axis=-1, keepdims=False) -> jnp.ndarray:
    """||v|| with a finite gradient at v == 0 (grad 0 there, instead of the
    NaN that sqrt(sum(v^2)) autodiff produces). Essential: capacity-padded
    dead slots hold exact zeros and their cotangents must stay clean."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    zero = sq == 0.0
    safe = jnp.sqrt(jnp.where(zero, 1.0, sq))
    return jnp.where(zero, 0.0, safe)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize along the last axis (torch F.normalize semantics:
    division by max(||q||, eps))."""
    n = _safe_norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, wxyz (utils/general_utils.py:103-113)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def to_rotation_matrix(q: jnp.ndarray, normalized: bool = False) -> jnp.ndarray:
    """[..., 4] wxyz quaternion -> [..., 3, 3] rotation matrix
    (utils/general_utils.py:79-97 build_rotation)."""
    if not normalized:
        q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def unit_to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector (axis * angle), angle in [0, 2pi).

    Matches roma.unitquat_to_rotvec (used at utils/func_utils.py:163) up to
    convention: roma flips quaternions to the w>=0 hemisphere first (shortest
    arc, angle in [0, pi]); we do the same so spline blending never takes the
    long way around.
    """
    q = jnp.where(q[..., 0:1] < 0.0, -q, q)
    w = q[..., 0]
    v = q[..., 1:]
    vn = _safe_norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(vn, w)
    # sinc-guarded axis scale: angle / sin(angle/2) ~ 2 + angle^2/12 near 0
    half = 0.5 * angle
    small = vn < _EPS
    scale = jnp.where(small, 2.0 + half * half / 3.0, angle / jnp.where(small, 1.0, vn))
    return v * scale[..., None]


def rotvec_to_unit(rv: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> unit quaternion (roma.rotvec_to_unitquat analog,
    utils/func_utils.py:164), wxyz output."""
    angle = _safe_norm(rv, axis=-1)
    half = 0.5 * angle
    small = angle < _EPS
    # sin(half)/angle with series guard: 1/2 - angle^2/48 near 0
    k = jnp.where(small, 0.5 - angle * angle / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.cos(half)
    return jnp.concatenate([w[..., None], rv * k[..., None]], axis=-1)


def log(q: jnp.ndarray) -> jnp.ndarray:
    """General quaternion log (utils/general_utils.py:115-121 semantics):
    [log|q|, axis * arccos(w/|q|)] — arctan2-stabilized."""
    qn = jnp.maximum(_safe_norm(q, axis=-1, keepdims=True), 1e-5)
    w = q[..., 0:1]
    v = q[..., 1:]
    vn = _safe_norm(v, axis=-1, keepdims=True)
    axis = v / jnp.maximum(vn, 1e-12)
    angle = jnp.arctan2(vn, w)
    return jnp.concatenate([jnp.log(qn), axis * angle], axis=-1)


def exp(q: jnp.ndarray) -> jnp.ndarray:
    """General quaternion exp (utils/general_utils.py:123-129 semantics)."""
    s = q[..., 0:1]
    v = q[..., 1:]
    vn = _safe_norm(v, axis=-1, keepdims=True)
    small = vn < _EPS
    sinc = jnp.where(small, 1.0 - vn * vn / 6.0, jnp.sin(vn) / jnp.where(small, 1.0, vn))
    out = jnp.concatenate([jnp.cos(vn), sinc * v], axis=-1)
    return jnp.exp(s) * out
