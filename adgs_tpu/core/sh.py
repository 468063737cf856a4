"""Real spherical-harmonics evaluation (degrees 0..3) and RGB<->SH helpers.

Capability parity with the reference SH paths:
  - CUDA constant tables + forward eval: cuda_rasterizer/auxiliary.h:22-39,
    cuda_rasterizer/forward.cu:20-71 (computeColorFromSH)
  - Python-side eval + RGB2SH/SH2RGB: utils/sh_utils.py:26-117

The renderer evaluates SH at the (un-normalized-then-normalized) direction
from the camera center to each Gaussian and clamps the result at 0 after
adding the +0.5 offset; the clamp mask participates in the backward pass
(gradients are zeroed for clamped channels, backward.cu:31-34). Here the
clamp is expressed with jnp.maximum so JAX autodiff reproduces that masking
for free; `eval_sh_color` returns the pre-clamp value as well for kernels
that hand-derive the VJP.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis values (coefficients folded in), [..., (deg+1)**2].

    Basis functions and constants match the CUDA preprocess tables
    (cuda_rasterizer/auxiliary.h:22-39, forward.cu:20-71).
    """
    if not (0 <= deg <= 3):
        raise ValueError(f"SH degree must be in [0, 3], got {deg}")
    ones = jnp.ones_like(dirs[..., 0:1])
    cols = [SH_C0 * ones]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        cols += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            cols += [
                SH_C2[0] * xy,
                SH_C2[1] * yz,
                SH_C2[2] * (2.0 * zz - xx - yy),
                SH_C2[3] * xz,
                SH_C2[4] * (xx - yy),
            ]
            if deg > 2:
                cols += [
                    SH_C3[0] * y * (3.0 * xx - yy),
                    SH_C3[1] * xy * z,
                    SH_C3[2] * y * (4.0 * zz - xx - yy),
                    SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    SH_C3[4] * x * (4.0 * zz - xx - yy),
                    SH_C3[5] * z * (xx - yy),
                    SH_C3[6] * x * (xx - 3.0 * yy),
                ]
    return jnp.concatenate(cols, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate real SH basis contraction.

    Args:
      deg: active SH degree in [0, 3] (static Python int).
      sh: [..., K, C] coefficients with K >= (deg+1)**2 (channel-last like the
        reference's (N, coeffs, 3) layout, scene/gaussian_model.py:272-275).
      dirs: [..., 3] unit directions.

    Returns:
      [..., C] evaluated values (no +0.5 offset, no clamp).

    Implemented as basis-stack + one broadcast contraction (NOT a chain of
    16 per-coefficient adds): the chained form's autodiff accumulates d_sh
    as 16 pad-adds of [..., 1, C] slices, which XLA materializes as 16
    sublane-padded [N, 16, 3] temps (~488 MB each at N=1M) when layout
    propagation denies it the fusion — a compile-time OOM. Here d_sh is a
    single basis[..., :, None] * g[..., None, :] broadcast product.
    """
    k = num_sh_coeffs(deg)
    basis = sh_basis(deg, dirs)
    return jnp.sum(basis[..., :, None] * sh[..., :k, :], axis=-2)


def eval_sh_color(deg: int, sh: jnp.ndarray, means: jnp.ndarray,
                  campos: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SH -> RGB exactly like the rasterizer preprocess (forward.cu:20-71).

    Returns (clamped_rgb, pre_clamp_rgb); clamped = max(raw + 0.5 ... , 0).
    """
    d = means - campos
    sq = jnp.sum(d * d, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq))  # NaN-grad-safe at d == 0
    d = d / jnp.where(sq == 0.0, 1.0, n)
    raw = eval_sh(deg, sh, d) + 0.5
    return jnp.maximum(raw, 0.0), raw


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """utils/sh_utils.py:113-114."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """utils/sh_utils.py:116-117."""
    return sh * SH_C0 + 0.5
