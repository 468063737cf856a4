"""Loss assembly for one training frame.

Parity with the loss block of train.py:77-115: L1 + D-SSIM photometric,
scale-shift-aligned monocular depth, projected optical-flow, object-mask BCE,
sky BCE on (1 - accumulated opacity), time-sigma prior, and the two
KNN-variance regularizers. Loss weights come from OptimizationConfig
(lambda_* of arguments/__init__.py:126-133); a zero lambda statically
removes the term from the graph.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianConfig, GaussianParams, GaussianState
from ..ops import depth as depth_ops
from ..ops import flow as flow_ops
from ..ops import image as image_ops
from .config import OptimizationConfig


class FrameBatch(NamedTuple):
    """Ground-truth supervision for one camera frame (loadCam contract,
    utils/camera_utils.py:22-88). Missing channels are zero arrays; the
    static lambda flags decide which terms exist."""

    image: jnp.ndarray            # [3,H,W]
    depth: jnp.ndarray            # [H,W] normalized inverse depth prior
    sky: jnp.ndarray              # [H,W] 1 = sky
    semantic: jnp.ndarray         # [H,W] >0 = object
    flow: Optional[flow_ops.FlowPackage] = None
    flow_valid: jnp.ndarray | None = None  # scalar bool


def _bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch F.binary_cross_entropy after the caller's clip."""
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))


# KNN-group gather with a sort-based segment-sum backward. Autodiff of
# the plain gather transposes to a scatter-add of ~A*K rows into [No, D]
# — the TPU scatter-add wall made the regularizer pair cost ~86 ms at
# 100k x 8 groups (exp/lab_lossbwd). The custom VJP re-routes the
# backward: 1-key sort of the flat ids + one row gather + a SORTED
# segment_sum (the sorted contiguous scatter-add rides the fast path) —
# 10.4 ms standalone for the pair (exp/lab_groupvar_pair), production
# train step 5.48 -> 8.34 it/s (round 4).
#
# A third tier (pallas MXU segment reduce via the raster pipeline's
# segment_reduce_contiguous, 7.7 ms standalone) was DELETED in round 5:
# it deterministically faulted ("UNAVAILABLE: TPU device error") when
# composed into the full 1M train step in several configurations while
# passing every standalone/parity/coexistence repro (the round-4
# evidence matrix lives in exp/repro_reg*.py and the round-4 history of
# this comment). The ~2.7 ms it could save did not justify shipping a
# kernel with an unexplained compiled-path fault; the raster pipeline's
# own segment_reduce_contiguous use (disjoint per-tile grad columns) has
# never faulted and is unaffected.
#
# Tiers (ADGS_REG_MXU): 0 = autodiff scatter (always-safe reference),
# 2 = sort + row gather + SORTED segment_sum — DEFAULT. (1 maps to 2.)
import os as _os

REG_MXU = int(_os.environ.get("ADGS_REG_MXU", "2"))
if REG_MXU == 1:  # the deleted MXU tier
    REG_MXU = 2


@jax.custom_vjp
def _group_gather(values2d: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values2d [No, D], idx [A, K] -> [A, K, D]."""
    return jax.lax.optimization_barrier(
        jax.lax.optimization_barrier(values2d)[
            jax.lax.optimization_barrier(idx)])


def _gg_fwd(values2d, idx):
    return _group_gather(values2d, idx), (idx, values2d.shape[0])


def _gg_bwd(res, d_g):
    import numpy as _np
    idx, No = res
    # firewall the cotangent from the surrounding step graph (gathers
    # fused into elementwise fusions scalarize, PERF.md item 2)
    d_g = jax.lax.optimization_barrier(d_g)
    A, K = idx.shape
    D = d_g.shape[-1]
    R = A * K
    flat = idx.reshape(R).astype(jnp.int32)
    s, perm = jax.lax.sort((flat, jnp.arange(R, dtype=jnp.int32)),
                           num_keys=1, is_stable=False)
    rows = d_g.reshape(R, D)
    gm = jax.lax.optimization_barrier(
        jax.lax.optimization_barrier(rows)[
            jax.lax.optimization_barrier(perm)])     # [R, D]
    per = jax.ops.segment_sum(gm, s, num_segments=No,
                              indices_are_sorted=True)
    return per, _np.zeros(idx.shape, jax.dtypes.float0)


_group_gather.defvjp(_gg_fwd, _gg_bwd)


def _group_variance_loss(values: jnp.ndarray, idx: jnp.ndarray,
                         valid: jnp.ndarray) -> jnp.ndarray:
    """mean over groups of sum(var over group members) — the KNN trajectory
    regularizer (train.py:103-105, 111-114). torch.var is unbiased (ddof=1).

    values: [No, ...]; idx: [A,K]; valid: [A]."""
    # barrier-isolate the gather: fused into the train step's elementwise
    # fusions it SCALARIZES (the known TPU pathology, PERF.md item 2) —
    # measured 144 ms inside the full train graph vs 0.22 ms standalone
    # (exp/lab_trainbwd.py). REG_MXU additionally replaces the backward's
    # scatter-add (the ~80 ms wall at production group counts) with the
    # sort + MXU segment-reduce pipeline via _group_gather.
    A = idx.shape[0]
    if REG_MXU in (1, 2):
        vflat = values.reshape(values.shape[0], -1)
        g2 = _group_gather(vflat, idx)                # [A,K,D]
        mean2 = jnp.mean(g2, axis=1, keepdims=True)
        k = idx.shape[1]
        var2 = (jnp.sum((g2 - mean2) ** 2, axis=1)
                / jnp.maximum(k - 1, 1))              # [A,D]
        var = var2.reshape((A,) + values.shape[1:])
    else:
        values = jax.lax.optimization_barrier(values)
        idx = jax.lax.optimization_barrier(idx)
        g = jax.lax.optimization_barrier(values[idx])     # [A,K,...]
        mean = jnp.mean(g, axis=1, keepdims=True)
        k = idx.shape[1]
        var = (jnp.sum((g - mean) ** 2, axis=1)
               / jnp.maximum(k - 1, 1))               # [A,...]
    summed = jnp.sum(var, axis=-1)                    # [A] or [A,D]
    per_group = summed.reshape(summed.shape[0], -1).mean(axis=-1)   # [A]
    w = valid.astype(jnp.float32)
    return jnp.sum(per_group * w) / jnp.maximum(jnp.sum(w), 1.0)


def _group_variance_pair(values_a, values_b, idx, valid):
    """Both KNN regularizers through ONE gather + ONE backward: the
    flattened columns concatenate (losses/grads identical to two separate
    calls — per-column math is independent), halving the sort/reduce
    work."""
    if not REG_MXU:
        return (_group_variance_loss(values_a, idx, valid),
                _group_variance_loss(values_b, idx, valid))
    A = idx.shape[0]
    fa = values_a.reshape(values_a.shape[0], -1)
    fb = values_b.reshape(values_b.shape[0], -1)
    wa = fa.shape[1]
    g2 = _group_gather(jnp.concatenate([fa, fb], axis=1), idx)
    mean2 = jnp.mean(g2, axis=1, keepdims=True)
    k = idx.shape[1]
    var2 = jnp.sum((g2 - mean2) ** 2, axis=1) / jnp.maximum(k - 1, 1)
    out = []
    for v, sl in ((values_a, var2[:, :wa]), (values_b, var2[:, wa:])):
        var = sl.reshape((A,) + v.shape[1:])
        summed = jnp.sum(var, axis=-1)
        per_group = summed.reshape(summed.shape[0], -1).mean(axis=-1)
        w = valid.astype(jnp.float32)
        out.append(jnp.sum(per_group * w) / jnp.maximum(jnp.sum(w), 1.0))
    return tuple(out)


def _knn_reg_losses(params: GaussianParams, state: GaussianState,
                    opt: OptimizationConfig) -> dict:
    """The active KNN-variance regularizers, fused into one gather when
    both are on (the reference presets' default)."""
    want_r = opt.lambda_reg > 0.0
    want_s = opt.lambda_sigma > 0.0 and opt.lambda_sigma_reg > 0.0
    out: dict = {}
    if want_r and want_s:
        rg, sr = _group_variance_pair(
            params.xyz_deform, params.gs_time_sigma,
            state.obj_near_idx, state.obj_near_valid)
        out["reg_loss"], out["sigma_reg_loss"] = rg, sr
    elif want_r:
        out["reg_loss"] = _group_variance_loss(
            params.xyz_deform, state.obj_near_idx, state.obj_near_valid)
    elif want_s:
        out["sigma_reg_loss"] = _group_variance_loss(
            params.gs_time_sigma, state.obj_near_idx, state.obj_near_valid)
    return out


def gaussian_term_losses(
    params: GaussianParams,
    state: GaussianState,
    opt: OptimizationConfig,
    frame_gap: float,
) -> tuple[jnp.ndarray, dict]:
    """The per-Gaussian (image-free) loss terms: KNN-variance regularizers
    and the time-sigma prior. Factored out so the slab-sharded loss path
    (parallel/shard.py) can compute image terms per device and add these
    once on replicated parameters."""
    total = jnp.float32(0.0)
    logs: dict = dict(_knn_reg_losses(params, state, opt))
    if "reg_loss" in logs:
        total = total + opt.lambda_reg * logs["reg_loss"]
    if opt.lambda_sigma > 0.0:
        sigma = jnp.exp(params.gs_time_sigma)
        alive = state.obj_alive.astype(jnp.float32)
        per = jnp.abs(frame_gap / jnp.mean(sigma, axis=-1))
        sg = jnp.sum(per * alive) / jnp.maximum(jnp.sum(alive), 1.0)
        total = total + opt.lambda_sigma * sg
        logs["sigma_loss"] = sg
        if "sigma_reg_loss" in logs:
            total = total + opt.lambda_sigma_reg * logs["sigma_reg_loss"]
    return total, logs


def compute_losses(
    render_pkg: dict,
    batch: FrameBatch,
    params: GaussianParams,
    state: GaussianState,
    config: GaussianConfig,
    opt: OptimizationConfig,
    frame_gap: float,
    scene_extent: float,
) -> tuple[jnp.ndarray, dict]:
    image = render_pkg["render"]
    logs = {}

    l1 = jnp.mean(jnp.abs(image - batch.image))
    dssim = 1.0 - image_ops.ssim(image, batch.image)
    total = (1.0 - opt.lambda_dssim) * opt.lambda_l1 * l1 \
        + opt.lambda_dssim * dssim
    logs["l1_loss"] = l1
    logs["dssim_loss"] = dssim

    if opt.lambda_depth > 0.0:
        d = depth_ops.depth_loss(render_pkg["depth"], batch.depth)
        total = total + opt.lambda_depth * d
        logs["depth_loss"] = d

    if opt.lambda_flow > 0.0 and batch.flow is not None:
        fl = flow_ops.flow_loss(render_pkg["img_flow"], batch.flow,
                                render_pkg["img_opacity"],
                                dist=scene_extent * 1e-3)
        if batch.flow_valid is not None:
            fl = jnp.where(batch.flow_valid, fl, 0.0)
        total = total + opt.lambda_flow * fl
        logs["flow_loss"] = fl

    if opt.lambda_obj > 0.0:
        pred = jnp.clip(render_pkg["img_semantic"][0], 1e-3, 1.0 - 1e-3)
        ob = _bce(pred, (batch.semantic > 0).astype(jnp.float32))
        total = total + opt.lambda_obj * ob
        logs["obj_loss"] = ob

    if opt.lambda_sky > 0.0:
        pred = jnp.clip(render_pkg["img_opacity"], 1e-3, 1.0 - 1e-3)
        sk = _bce(1.0 - pred, batch.sky)
        total = total + opt.lambda_sky * sk
        logs["sky_loss"] = sk

    reg_logs = _knn_reg_losses(params, state, opt)
    logs.update(reg_logs)
    if "reg_loss" in reg_logs:
        total = total + opt.lambda_reg * reg_logs["reg_loss"]

    if opt.lambda_sigma > 0.0:
        sigma = jnp.exp(params.gs_time_sigma)
        alive = state.obj_alive.astype(jnp.float32)
        per = jnp.abs(frame_gap / jnp.mean(sigma, axis=-1))
        sg = jnp.sum(per * alive) / jnp.maximum(jnp.sum(alive), 1.0)
        total = total + opt.lambda_sigma * sg
        logs["sigma_loss"] = sg
        if "sigma_reg_loss" in reg_logs:
            total = total + opt.lambda_sigma_reg * reg_logs["sigma_reg_loss"]

    logs["total_loss"] = total
    return total, logs
