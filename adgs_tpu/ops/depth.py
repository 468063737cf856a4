"""Monocular-depth alignment: closed-form scale/shift least squares.

Parity: utils/depth_utils.py:9-45 (normalized_depth_scale_and_shift) and the
L1 depth loss of utils/loss_utils.py:68-73.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_scale_shift(prediction: jnp.ndarray, target: jnp.ndarray,
                      mask: jnp.ndarray | None = None):
    """Closed-form (scale, shift) minimizing ||scale*pred + shift - target||^2
    over masked pixels. Returns (scale, shift); degenerate -> (0, 0)."""
    if mask is None:
        mask = jnp.ones_like(prediction)
    a00 = jnp.sum(mask * prediction * prediction)
    a01 = jnp.sum(mask * prediction)
    a11 = jnp.sum(mask)
    b0 = jnp.sum(mask * prediction * target)
    b1 = jnp.sum(mask * target)
    det = a00 * a11 - a01 * a01
    safe = jnp.where(det == 0.0, 1.0, det)
    scale = jnp.where(det == 0.0, 0.0, (a11 * b0 - a01 * b1) / safe)
    shift = jnp.where(det == 0.0, 0.0, (-a01 * b0 + a00 * b1) / safe)
    return scale, shift


def scaled_shifted_depth(prediction: jnp.ndarray, target: jnp.ndarray,
                         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    scale, shift = depth_scale_shift(prediction, target, mask)
    return scale * prediction + shift


def depth_loss(prediction: jnp.ndarray, target: jnp.ndarray,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """get_depth_loss (utils/loss_utils.py:68-73): masked L1 after alignment."""
    pred = scaled_shifted_depth(prediction, target, mask)
    if mask is None:
        mask = jnp.ones_like(pred)
    return jnp.sum(jnp.abs(pred - target) * mask) / jnp.maximum(jnp.sum(mask), 1.0)
