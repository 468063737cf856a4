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


# KNN-group gather with an MXU segment-reduce backward. Autodiff of the
# plain gather transposes to a scatter-add of ~A*K rows into [No, D] —
# the TPU scatter-add wall made the regularizer pair cost ~86 ms at
# 100k x 8 groups (exp/lab_lossbwd). The custom VJP re-routes the
# backward through the raster grad pipeline's machinery: 1-key sort of
# the flat ids + one row gather + the per-gaussian one-hot MXU reduce
# (segment_reduce_contiguous). Set ADGS_REG_MXU=1 for the MXU tier.
#
# DEFAULT OFF (round-4 open issue). Evidence matrix (exp/repro_reg*.py,
# all at the bench scale: 1M gaussians, 312.5k obj, 39k x 8 groups):
#   MXU backward STANDALONE, exact shapes+content ... OK (5/5 arms)
#   full train step, scatter backward ............. OK (4 steps, on chip)
#   full train step, MXU backward ................. "UNAVAILABLE: TPU
#       device error", DETERMINISTIC (reproduced in a healthy window;
#       ADGS_XPF=0 unchanged, so not the prefetch)
#   full step, MXU, backend=xla raster tier ....... FAULT (raster
#       pallas kernels exonerated)
#   reg grad + expand + env kernels in one jit .... OK (coexistence is
#       not sufficient; needs more of the step graph — exp/repro_reg4)
#   small-scale trainer end-to-end on chip ........ OK (exp/train_onchip)
#   full step, sort+gather+sorted segment_sum ..... OK (exp/repro_reg5)
#   full step, ONE MXU instance (xyz-only or sigma-only) OK; BOTH
#       instances, or the fused Gc=104 single instance .. FAULT
#       (exp/repro_reg6, repro_reg_pair1b — so instance count alone is
#       not the whole story either)
# => the trigger is the segment_reduce_contiguous pallas call in the
# full-step context specifically. Standalone wins 72.8 -> 11.2 ms for
# the pair (exp/lab_groupvar.py, grads 6e-8).
#
# Tiers (ADGS_REG_MXU): 0 = autodiff scatter (always-safe reference),
# 1 = pallas MXU segment reduce (fastest; SHELVED for in-step use),
# 2 = sort + row gather + SORTED segment_sum (fault-free in-step; the
#     sorted contiguous scatter-add rides the fast path) — DEFAULT.
import os as _os

REG_MXU = int(_os.environ.get("ADGS_REG_MXU", "2"))


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
    from ..raster.pallas.render import (SEG_C, _round8,
                                        segment_reduce_contiguous)
    idx, No = res
    # firewall the cotangent from the surrounding step graph: the in-step
    # fault (evidence matrix above) never reproduces when d_g comes from
    # a simple upstream, pointing at fusion across this boundary
    d_g = jax.lax.optimization_barrier(d_g)
    A, K = idx.shape
    D = d_g.shape[-1]
    Gc = _round8(D)
    R = A * K
    R_seg = -(-R // SEG_C) * SEG_C + SEG_C
    flat = idx.reshape(R).astype(jnp.int32)
    s, perm = jax.lax.sort((flat, jnp.arange(R, dtype=jnp.int32)),
                           num_keys=1, is_stable=False)
    rows = d_g.reshape(R, D)
    if REG_MXU == 2:
        gm = jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(rows)[
                jax.lax.optimization_barrier(perm)])     # [R, D]
        per = jax.ops.segment_sum(gm, s, num_segments=No,
                                  indices_are_sorted=True)
        return per, _np.zeros(idx.shape, jax.dtypes.float0)
    if Gc != D:
        rows = jnp.concatenate(
            [rows, jnp.zeros((R, Gc - D), jnp.float32)], axis=1)
    rows = jnp.concatenate([rows, jnp.zeros((1, Gc), jnp.float32)])
    perm = jnp.concatenate([perm, jnp.full((R_seg - R,), R, jnp.int32)])
    perm = jax.lax.optimization_barrier(perm)
    gm = jax.lax.optimization_barrier(
        jax.lax.optimization_barrier(rows)[perm])        # [R_seg, Gc]
    cols = gm.T                                          # [Gc, R_seg]
    # exclusive member-count prefix per gaussian. NOT jnp.searchsorted —
    # 300k queries over 300k sorted keys measured 40.8 ms on-chip
    # (exp/lab_gv2.py); a sorted-index scatter + MXU cumsum is ~1 ms
    # (the binning expansion's inverse-prefix pattern, binning.py)
    from ..raster.binning import cumsum_mxu
    counts = jnp.zeros((No,), jnp.int32).at[s].add(
        jnp.ones_like(s), mode="drop", indices_are_sorted=True)
    gauss_start = (cumsum_mxu(counts) - counts).astype(jnp.int32)
    per = jax.lax.optimization_barrier(segment_reduce_contiguous(
        cols, gauss_start, jnp.int32(R), No))            # [No, Gc]
    return per[:, :D], _np.zeros(idx.shape, jax.dtypes.float0)


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
    calls — per-column math is independent). Besides halving the
    sort/reduce work, the single-instance form is the one the in-step
    MXU tier is chip-validated for (two segment-reduce instances in the
    full step fault; one is fine — exp/repro_reg6)."""
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
