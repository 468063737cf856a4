"""Front-to-back alpha compositing, vectorized for TPU.

Replicates the sequential per-pixel loop of renderCUDA (forward.cu:261-402)
as a closed-form prefix computation:

  raw loop:  alpha = min(0.99, op * exp(power));  skip if power > 0 or
             alpha < 1/255;  stop (all later too) once T*(1-alpha) < 1e-4;
             C += f * alpha * T;  T *= (1-alpha)

  closed form over a front-to-back alpha sequence a_j:
             a_j <- 0 where power_j > 0 or a_j < 1/255
             Tincl_j = prod_{k<=j} (1 - a_k)
             include_j = Tincl_j >= 1e-4          (termination semantics:
                 the first j whose inclusion would push T below 1e-4 is
                 dropped, and every later raw product is smaller still, so
                 a single mask on the RAW running product is exact)
             w_j = a_j * include_j * prod_{k<j} (1 - a_k * include_k)
             C = sum_j w_j f_j + T_final * bg

Weights are a cumulative product (cumsum in log space — every surviving
alpha is <= 0.99 so log1p is finite) and feature accumulation is a
[pix, G] @ [G, ch] matmul — exactly the MXU-friendly shape. Because it is
pure jnp, JAX autodiff reproduces the hand-written CUDA backward
(backward.cu:417-646) including the T_final/(1-alpha) accumulated-opacity
path — no atomics, deterministic segment reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
DEPTH_EPS = 1e-7


def gaussian_alpha(conic: jnp.ndarray, opacity: jnp.ndarray,
                   delta: jnp.ndarray) -> jnp.ndarray:
    """Per (gaussian, pixel) alpha with the reference's gates.

    conic: [..., 3]; opacity: [...]; delta = mean2d - pix: [..., 2].
    Returns alpha in [0, 0.99] with the power>0 and alpha<1/255 gates
    already applied as zeros (forward.cu:344-357).
    """
    dx = delta[..., 0]
    dy = delta[..., 1]
    power = (-0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy)
             - conic[..., 1] * dx * dy)
    alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(power))
    return jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)


class BlendWeights(NamedTuple):
    weights: jnp.ndarray  # [..., G] per-contribution weight alpha_j * T_j
    t_raw: jnp.ndarray    # [...] raw running product incl. excluded alphas
    t_eff: jnp.ndarray    # [...] effective transmittance (the rendered T)


def blend_weights(alpha: jnp.ndarray,
                  t_raw_carry: jnp.ndarray | None = None,
                  t_eff_carry: jnp.ndarray | None = None) -> BlendWeights:
    """Closed-form front-to-back weights along the LAST axis.

    The termination gate (`done` in forward.cu:356-361) is a test on the RAW
    running product prod(1-a_k) — which is monotonically decreasing, so the
    set of included contributions is always a prefix, and the gate stays
    exact under chunking as long as the raw product is carried alongside the
    effective transmittance (they only diverge after termination).

    t_raw_carry / t_eff_carry: [...] products entering this block (chunked
    processing); default 1. Use `.t_eff` of the final chunk as final_T.
    """
    if t_raw_carry is None:
        t_raw_carry = jnp.ones(alpha.shape[:-1], dtype=alpha.dtype)
    if t_eff_carry is None:
        t_eff_carry = t_raw_carry
    log1m = jnp.log1p(-alpha)
    log_t_raw = jnp.cumsum(log1m, axis=-1) + jnp.log(
        jnp.maximum(t_raw_carry, 1e-38))[..., None]
    include = (jnp.exp(log_t_raw) >= T_EPS) & (t_raw_carry[..., None] >= T_EPS)
    a_eff = jnp.where(include, alpha, 0.0)
    log1m_eff = jnp.log1p(-a_eff)
    log_t_excl = (jnp.cumsum(log1m_eff, axis=-1) - log1m_eff
                  + jnp.log(jnp.maximum(t_eff_carry, 1e-38))[..., None])
    weights = a_eff * jnp.exp(log_t_excl)
    t_eff = jnp.exp(log_t_excl[..., -1] + log1m_eff[..., -1])
    t_raw = jnp.exp(log_t_raw[..., -1])
    return BlendWeights(weights=weights, t_raw=t_raw, t_eff=t_eff)


def depth_feature(depth: jnp.ndarray, inv_depth: bool) -> jnp.ndarray:
    """forward.cu:374-375."""
    if inv_depth:
        return 1.0 / (depth + DEPTH_EPS)
    return depth
