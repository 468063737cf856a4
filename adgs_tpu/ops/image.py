"""Image metrics: SSIM (train loss) and PSNR/MSE (eval).

Parity: utils/loss_utils.py:26-66 (11x11 Gaussian window, sigma 1.5,
per-channel depthwise conv, SAME zero padding) and utils/image_utils.py:13-18.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def _depthwise_filter(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] same-padded per-channel 2D filter."""
    C = img.shape[1]
    k = jnp.asarray(window)[None, None].repeat(C, axis=0)  # [C,1,kh,kw]
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11
         ) -> jnp.ndarray:
    """Mean SSIM over [C,H,W] or [B,C,H,W] images in [0,1]."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    w = _gaussian_window(window_size)
    mu1 = _depthwise_filter(img1, w)
    mu2 = _depthwise_filter(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, w) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2))
                / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    return jnp.mean(ssim_map)


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """utils/image_utils.py:13-18 (per-image mean over flattened pixels)."""
    m = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))
