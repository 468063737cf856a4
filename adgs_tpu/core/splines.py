"""Temporal trajectory bases: B-spline, polynomial, Fourier, and the
cumulative quaternion B-spline.

Capability parity with utils/func_utils.py:
  - get_deboor_cox_mat (:33-50): recursive uniform B-spline basis matrix.
  - get_bspline_basic_func (:65-77) / get_poly_basic_func (:59-63) /
    get_fft_basic_func (:52-57).
  - set_default_param_order (:82-119) -> `default_basis_config`.
  - get_func_result (:121-173) -> `eval_trajectory` / `eval_quat_trajectory`.

TPU notes: the reference slices a LOCAL control-point window with
`int(v * interval)` — a data-dependent Python slice. Here the window is a
`lax.dynamic_slice` on the last (contraction) axis, so the whole evaluation
is one gather + small dense contractions and traces once for any t. The
de Boor matrices are static numpy constants baked into the jaxpr.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import quaternion as quat


@functools.lru_cache(maxsize=None)
def deboor_cox_matrix(order: int) -> np.ndarray:
    """(order+1, order+1) uniform B-spline basis matrix M with
    basis(u) = [1, u, ..., u^k] @ M (utils/func_utils.py:33-50)."""
    if order == 0:
        return np.array([[1.0]], dtype=np.float32)
    prior = deboor_cox_matrix(order - 1)
    prior_left = np.concatenate([prior, np.zeros((1, prior.shape[1]), np.float32)], axis=0)
    prior_right = np.concatenate([np.zeros((1, prior.shape[1]), np.float32), prior], axis=0)
    idx = np.arange(order)
    teo_left = np.zeros((order, order + 1), dtype=np.float32)
    teo_left[idx, idx] = idx + 1
    teo_left[idx, idx + 1] = order - idx - 1
    teo_right = np.zeros((order, order + 1), dtype=np.float32)
    teo_right[idx, idx] = -1
    teo_right[idx, idx + 1] = 1
    return ((prior_left @ teo_left + prior_right @ teo_right) / order).astype(np.float32)


def bspline_basis(u: jnp.ndarray, order: int) -> jnp.ndarray:
    """basis weights over the k+1 control points of the active window."""
    mat = jnp.asarray(deboor_cox_matrix(order))
    powers = u ** jnp.arange(0.0, order + 1.0)
    return jnp.matmul(powers, mat, precision="highest")


def poly_basis(v: jnp.ndarray, order: int) -> jnp.ndarray:
    freq = jnp.arange(1.0, order + 1.0)
    return v ** freq


def fourier_basis(v: jnp.ndarray, order: int) -> jnp.ndarray:
    freq = jnp.arange(1.0, order + 1.0) * jnp.pi
    return jnp.concatenate([jnp.sin(v * freq), jnp.cos(v * freq)], axis=-1)


class BasisConfig(NamedTuple):
    """Static per-quantity basis spec, the 6-tuple of
    arguments/__init__.py:71-77 after default filling."""

    bspline_ctrl: int = 0
    bspline_order: int = 0
    poly_order: int = 0
    fft_order: int = 0
    quat_ctrl: int = 0
    quat_order: int = 0

    @property
    def param_count(self) -> int:
        """utils/func_utils.py:79-80."""
        return self.bspline_ctrl + self.poly_order + 2 * self.fft_order + self.quat_ctrl


def default_basis_config(args: Optional[list], frame_num: int,
                         downsample_ratio: int = 3) -> BasisConfig:
    """Fill None entries like set_default_param_order (utils/func_utils.py:82-119)."""
    a = list(args) if args is not None else [None] * 6
    bspline_ctrl = a[0] if a[0] is not None else int(frame_num // downsample_ratio)
    bspline_order = 0
    if bspline_ctrl > 0:
        bspline_order = a[1] if a[1] is not None else 5
        bspline_order = min(bspline_order, bspline_ctrl - 1)
    poly_order = a[2] if a[2] is not None else int(frame_num // downsample_ratio)
    fft_order = a[3] if a[3] is not None else 6
    quat_ctrl = a[4] if a[4] is not None else int(frame_num // downsample_ratio)
    quat_order = 0
    if quat_ctrl > 0:
        quat_order = a[5] if a[5] is not None else 1
        quat_order = min(quat_order, quat_ctrl - 1)
    return BasisConfig(bspline_ctrl, bspline_order, poly_order, fft_order,
                       quat_ctrl, quat_order)


def _window(param: jnp.ndarray, t: jnp.ndarray, ctrl: int, order: int,
            offset: int):
    """Select the active control window along the last axis.

    Returns (ctrl_pts [..., order+1], local coordinate u)."""
    interval = ctrl - order
    start = jnp.minimum(jnp.floor(t * interval).astype(jnp.int32), interval - 1)
    start = jnp.maximum(start, 0)
    pts = jax.lax.dynamic_slice_in_dim(param, offset + start, order + 1, axis=-1)
    u = t * interval - start
    return pts, u


def eval_trajectory(t: jnp.ndarray, param: jnp.ndarray,
                    cfg: BasisConfig) -> jnp.ndarray:
    """Vector-valued trajectory: B-spline + polynomial + Fourier terms of
    get_func_result (utils/func_utils.py:126-153). param: [..., C] with
    C = cfg.param_count (minus any quat block); returns [...]. The quaternion
    block, if present, must be evaluated with `eval_quat_trajectory` and
    added by the caller (matching the reference's result accumulation)."""
    result = jnp.zeros(param.shape[:-1], dtype=param.dtype)
    offset = 0
    if cfg.bspline_ctrl != 0:
        pts, u = _window(param, t, cfg.bspline_ctrl, cfg.bspline_order, 0)
        basis = bspline_basis(u, cfg.bspline_order)
        result = result + jnp.sum(pts * basis, axis=-1)
        offset += cfg.bspline_ctrl
    if cfg.poly_order != 0:
        p = jax.lax.slice_in_dim(param, offset, offset + cfg.poly_order, axis=-1)
        result = result + jnp.sum(p * poly_basis(t, cfg.poly_order), axis=-1)
        offset += cfg.poly_order
    if cfg.fft_order != 0:
        p = jax.lax.slice_in_dim(param, offset, offset + 2 * cfg.fft_order, axis=-1)
        result = result + jnp.sum(p * fourier_basis(t[..., None], cfg.fft_order), axis=-1)
        offset += 2 * cfg.fft_order
    return result


def eval_quat_trajectory(t: jnp.ndarray, param: jnp.ndarray,
                         cfg: BasisConfig) -> jnp.ndarray:
    """Cumulative quaternion B-spline (utils/func_utils.py:155-171), wxyz.

    param: [N, 4, C]; the quat control block occupies the LAST cfg.quat_ctrl
    columns (after bspline/poly/fft blocks, matching the reference offset).
    Control quats are raw params + identity offset, normalized; blending is
    q(t) = q0 * prod_i exp(cum_i * log(q_{i-1}^-1 q_i)).
    """
    if cfg.quat_ctrl == 0:
        raise ValueError("no quaternion spline block configured")
    offset = cfg.bspline_ctrl + cfg.poly_order + 2 * cfg.fft_order
    pts, u = _window(param, t, cfg.quat_ctrl, cfg.quat_order, offset)

    identity = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=param.dtype)
    ctrl = pts + identity[:, None]          # [N, 4, k+1]
    ctrl = jnp.swapaxes(ctrl, -1, -2)       # [N, k+1, 4] wxyz
    ctrl = quat.normalize(ctrl)

    basis = bspline_basis(u, cfg.quat_order)            # [k+1]
    cum = jnp.cumsum(basis[::-1])[::-1][1:]             # [k] cumulative tail sums

    delta = quat.multiply(quat.conjugate(ctrl[:, :-1, :]), ctrl[:, 1:, :])
    vec = quat.unit_to_rotvec(delta)                    # [N, k, 3]
    steps = quat.rotvec_to_unit(vec * cum[None, :, None])  # [N, k, 4]

    out = ctrl[:, 0, :]
    for i in range(cfg.quat_order):
        out = quat.multiply(out, steps[:, i, :])
    return out
