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
def _gaussian_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = _gaussian_1d(window_size, sigma)
    return np.outer(g, g).astype(np.float32)


# shifted-add tier for the separable filter: XLA's TPU depthwise-conv
# lowering (feature_group_count=C) is far off the VPU roofline; the same
# 1-D taps as STATIC-slice weighted sums fuse into one elementwise pass
# per axis. False restores conv_general_dilated (A/B, exp/lab_ssim.py).
SSIM_SHIFT = True


def _sep_pass(img: jnp.ndarray, axis: int, window_size: int) -> jnp.ndarray:
    """One 1-D Gaussian pass along `axis` via zero-pad + static slices."""
    g = _gaussian_1d(window_size)
    half = window_size // 2
    pads = [(0, 0)] * img.ndim
    pads[axis] = (half, half)
    padded = jnp.pad(img, pads)
    n = img.shape[axis]
    sl = [slice(None)] * img.ndim
    acc = None
    for k in range(window_size):
        sl[axis] = slice(k, k + n)
        term = float(g[k]) * padded[tuple(sl)]
        acc = term if acc is None else acc + term
    return acc


def _depthwise_filter(img: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """[B, C, H, W] same-(zero-)padded per-channel 11x11 Gaussian filter.

    The reference convolves the full outer-product window
    (utils/loss_utils.py:26-66); the window is separable, so two 1D passes
    (11+11 taps instead of 121) produce the same result — and the batched
    quantities (img1, img2, img1^2, img2^2, img1*img2) ride one conv pair.
    """
    if SSIM_SHIFT:
        return _sep_pass(_sep_pass(img, 2, window_size), 3, window_size)
    C = img.shape[1]
    g = jnp.asarray(_gaussian_1d(window_size))
    kv = jnp.broadcast_to(g[None, None, :, None], (C, 1, window_size, 1))
    kh = jnp.broadcast_to(g[None, None, None, :], (C, 1, 1, window_size))
    out = jax.lax.conv_general_dilated(
        img, kv, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        precision="highest")
    return jax.lax.conv_general_dilated(
        out, kh, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        precision="highest")


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11
             ) -> jnp.ndarray:
    """Per-pixel SSIM map (same shape as the inputs). The map at pixel p
    depends only on the window_size//2-neighbourhood of p, so slab-sharded
    callers (parallel/shard.py) can compute it on a halo-extended slab and
    crop — value-identical to the full-image computation."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    # one fused conv pair over the 5 filtered quantities
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1)
    f = _depthwise_filter(stacked, window_size)
    C = img1.shape[1]
    mu1, mu2 = f[:, :C], f[:, C:2 * C]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = f[:, 2 * C:3 * C] - mu1_sq
    sigma2_sq = f[:, 3 * C:4 * C] - mu2_sq
    sigma12 = f[:, 4 * C:5 * C] - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    return (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2))
            / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11
         ) -> jnp.ndarray:
    """Mean SSIM over [C,H,W] or [B,C,H,W] images in [0,1]."""
    return jnp.mean(ssim_map(img1, img2, window_size))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """utils/image_utils.py:13-18 (per-image mean over flattened pixels)."""
    m = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))
