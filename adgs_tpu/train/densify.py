"""Densification and pruning on capacity-padded blocks.

Parity with scene/gaussian_model.py:640-867 (densify_and_clone,
densify_and_split with N=2 and 0.8*N scale shrink, opacity/size pruning,
reset_opacity, Adam-state surgery) — re-architected for TPU: instead of
reallocating tensors, clone/split write into DEAD slots located with a
stable argsort of the alive mask, at fixed array shapes, entirely inside
jit. Adam moments ride along in the same scatter (zeros for new slots,
exactly like cat_tensors_to_optimizer :616-638; pruning just clears the
alive bit, so moments of dead slots are inert).

Capacity overflow (more requested clones/splits than dead slots) drops the
excess and reports it; the host trainer grows capacity (a recompile) when
`wanted > free`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.quaternion import to_rotation_matrix
from ..models.gaussians import GaussianParams, GaussianState
from .optim import AdamState, TrainableState


_SCENE_FIELDS = ("scene_xyz", "scene_shs_dc", "scene_shs_rest",
                 "scene_scaling", "scene_rotation", "scene_opacity",
                 "scene_shs_deform")
_OBJ_FIELDS = ("obj_xyz", "obj_shs_dc", "obj_shs_rest", "obj_scaling",
               "obj_rotation", "obj_opacity", "obj_shs_deform", "xyz_deform",
               "rotation_deform", "gs_time_sigma")


class DensifyReport(NamedTuple):
    scene_cloned: jnp.ndarray
    scene_split: jnp.ndarray
    obj_cloned: jnp.ndarray
    obj_split: jnp.ndarray
    scene_dropped: jnp.ndarray   # requested but no free slot
    obj_dropped: jnp.ndarray
    scene_pruned: jnp.ndarray
    obj_pruned: jnp.ndarray


def _scatter_copies(blocks: dict, alive: jnp.ndarray, src_mask: jnp.ndarray,
                    overrides: dict, copies: int):
    """Write `copies` modified duplicates of the masked slots into dead
    slots. blocks: name -> [C, ...] arrays (params + moments). overrides:
    name -> [copies, C, ...] replacement values for the new duplicates
    (others are raw copies; moment arrays should override to zeros).

    Returns (new_blocks, new_alive, n_written, n_dropped)."""
    C = alive.shape[0]
    src_order = jnp.argsort(~src_mask, stable=True)      # masked slots first
    free_order = jnp.argsort(alive, stable=True)         # dead slots first
    n_src = jnp.sum(src_mask)
    n_free = jnp.sum(~alive)

    k = jnp.arange(copies * C, dtype=jnp.int32)
    cand_src = src_order[k // copies]                    # [copies*C]
    copy_idx = k % copies
    valid = (k // copies < n_src) & (k < n_free)
    dest = jnp.where(valid, free_order[jnp.minimum(k, C - 1)], C)  # C = drop

    out = {}
    for name, arr in blocks.items():
        if name in overrides:
            vals = overrides[name][copy_idx, cand_src]
        else:
            vals = arr[cand_src]
        out[name] = arr.at[dest].set(vals, mode="drop")
    new_alive = alive.at[dest].set(True, mode="drop")
    n_written = jnp.sum(valid)
    n_dropped = copies * n_src - n_written
    return out, new_alive, n_written, n_dropped


def _block(params_and_moments: TrainableState, opt_state: AdamState,
           fields: tuple[str, ...]):
    blocks = {}
    for f in fields:
        blocks[f"p.{f}"] = getattr(params_and_moments.gaussians, f)
        blocks[f"m.{f}"] = getattr(opt_state.m.gaussians, f)
        blocks[f"v.{f}"] = getattr(opt_state.v.gaussians, f)
    return blocks


def _unblock(blocks: dict, trainables: TrainableState, opt_state: AdamState,
             fields: tuple[str, ...]):
    g = {f: blocks[f"p.{f}"] for f in fields}
    m = {f: blocks[f"m.{f}"] for f in fields}
    v = {f: blocks[f"v.{f}"] for f in fields}
    new_g = dataclasses.replace(trainables.gaussians, **g)
    new_m = dataclasses.replace(opt_state.m.gaussians, **m)
    new_v = dataclasses.replace(opt_state.v.gaussians, **v)
    return (trainables._replace(gaussians=new_g),
            AdamState(m=opt_state.m._replace(gaussians=new_m),
                      v=opt_state.v._replace(gaussians=new_v),
                      count=opt_state.count))


def _zero_moment_overrides(blocks: dict, fields, copies: int) -> dict:
    ov = {}
    for f in fields:
        for pre in ("m.", "v."):
            arr = blocks[pre + f]
            ov[pre + f] = jnp.zeros((copies,) + arr.shape, dtype=arr.dtype)
    return ov


def _densify_block(trainables, opt_state, state, fields, alive, grads_avg,
                   grad_threshold, extent, percent_dense, big_extent_frac,
                   prune_big, min_opacity, gs_time, key, prefix):
    """Clone + split + prune for one (scene or obj) block. Returns updated
    (trainables, opt_state, alive, gs_time, counts...)."""
    gauss = trainables.gaussians
    scaling = jnp.exp(getattr(gauss, f"{prefix}_scaling"))
    max_scale = jnp.max(scaling, axis=-1)
    densify = (grads_avg >= grad_threshold) & alive

    # --- clone (gaussian_model.py:775-823): small Gaussians, raw copies ---
    clone_mask = densify & (max_scale <= extent * percent_dense)
    blocks = _block(trainables, opt_state, fields)
    if gs_time is not None:
        blocks["s.gs_time"] = gs_time
    ov = _zero_moment_overrides(blocks, fields, 1)
    blocks, alive, n_cloned, drop_c = _scatter_copies(
        blocks, alive, clone_mask, ov, copies=1)

    # --- split (gaussian_model.py:714-773): large Gaussians, 2 samples ---
    split_mask = densify & (max_scale > extent * percent_dense)
    N = 2
    rot = to_rotation_matrix(getattr(gauss, f"{prefix}_rotation"))
    eps = jax.random.normal(key, (N,) + scaling.shape, dtype=scaling.dtype)
    samples = jnp.einsum("nij,cnj->cni", rot, eps * scaling[None],
                         precision="highest")
    base_xyz = (gauss.obj_xyz if prefix == "obj" else gauss.scene_xyz)
    new_xyz = base_xyz[None] + samples                      # [N, C, 3]
    new_scaling = jnp.log(scaling / (0.8 * N))[None].repeat(N, 0)
    xyz_f = "obj_xyz" if prefix == "obj" else "scene_xyz"
    sc_f = f"{prefix}_scaling"
    ov = _zero_moment_overrides(blocks, fields, N)
    ov[f"p.{xyz_f}"] = new_xyz
    ov[f"p.{sc_f}"] = new_scaling
    blocks, alive, n_split, drop_s = _scatter_copies(
        blocks, alive, split_mask, ov, copies=N)
    # prune split sources
    alive = alive & ~split_mask

    # --- opacity / size pruning (gaussian_model.py:851-858) ---
    opacity = jax.nn.sigmoid(blocks[f"p.{prefix}_opacity"][:, 0])
    prune = opacity < min_opacity
    scaling_now = jnp.exp(blocks[f"p.{prefix}_scaling"])
    big = jnp.max(scaling_now, axis=-1) > extent * big_extent_frac
    prune = jnp.where(prune_big, prune | big, prune)
    n_pruned = jnp.sum(prune & alive)
    alive = alive & ~prune

    gs_time_out = blocks.pop("s.gs_time", None)
    trainables, opt_state = _unblock(blocks, trainables, opt_state, fields)
    return (trainables, opt_state, alive, gs_time_out,
            n_cloned, n_split, drop_c + drop_s, n_pruned)


def densify_and_prune(
    trainables: TrainableState,
    opt_state: AdamState,
    state: GaussianState,
    key: jax.Array,
    max_scene_grad: float,
    max_obj_grad: float,
    min_opacity: float,
    prune_big: jnp.ndarray,      # bool scalar (iteration > opacity_reset)
    scene_extent: float,
    object_extent: float,
    percent_dense: float,
) -> tuple[TrainableState, AdamState, GaussianState, DensifyReport]:
    """densify_and_prune (gaussian_model.py:835-861), jit-compatible."""
    grads = state.xyz_grad_accum / jnp.maximum(state.denom, 1e-12)
    grads = jnp.where(state.denom > 0, grads, 0.0)
    Ns = trainables.gaussians.scene_capacity
    k_scene, k_obj = jax.random.split(key)

    (trainables, opt_state, scene_alive, _, sc_c, sc_s, sc_d, sc_p) = \
        _densify_block(trainables, opt_state, state, _SCENE_FIELDS,
                       state.scene_alive, grads[:Ns], max_scene_grad,
                       scene_extent, percent_dense, 0.05, prune_big,
                       min_opacity, None, k_scene, "scene")
    (trainables, opt_state, obj_alive, gs_time, ob_c, ob_s, ob_d, ob_p) = \
        _densify_block(trainables, opt_state, state, _OBJ_FIELDS,
                       state.obj_alive, grads[Ns:], max_obj_grad,
                       object_extent, percent_dense, 0.1, prune_big,
                       min_opacity, state.gs_time, k_obj, "obj")

    # stats reset (densification_postfix :709-712)
    new_state = dataclasses.replace(
        state,
        scene_alive=scene_alive,
        obj_alive=obj_alive,
        gs_time=gs_time,
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        denom=jnp.zeros_like(state.denom),
    )
    report = DensifyReport(scene_cloned=sc_c, scene_split=sc_s,
                           obj_cloned=ob_c, obj_split=ob_s,
                           scene_dropped=sc_d, obj_dropped=ob_d,
                           scene_pruned=sc_p, obj_pruned=ob_p)
    return trainables, opt_state, new_state, report


def reset_opacity(trainables: TrainableState, opt_state: AdamState
                  ) -> tuple[TrainableState, AdamState]:
    """reset_opacity (gaussian_model.py:461-465): clamp activated opacity to
    <= 0.01 and zero the opacity Adam moments (replace_tensor_to_optimizer
    :545-558)."""
    def new_raw(raw):
        act = jax.nn.sigmoid(raw)
        clamped = jnp.minimum(act, 0.01)
        return jnp.log(clamped / (1.0 - clamped))

    g = trainables.gaussians
    g = dataclasses.replace(
        g,
        scene_opacity=new_raw(g.scene_opacity),
        obj_opacity=new_raw(g.obj_opacity))
    m = dataclasses.replace(
        opt_state.m.gaussians,
        scene_opacity=jnp.zeros_like(g.scene_opacity),
        obj_opacity=jnp.zeros_like(g.obj_opacity))
    v = dataclasses.replace(
        opt_state.v.gaussians,
        scene_opacity=jnp.zeros_like(g.scene_opacity),
        obj_opacity=jnp.zeros_like(g.obj_opacity))
    return (trainables._replace(gaussians=g),
            AdamState(m=opt_state.m._replace(gaussians=m),
                      v=opt_state.v._replace(gaussians=v),
                      count=opt_state.count))


def grow_capacity(trainables: TrainableState, opt_state: AdamState,
                  state: GaussianState, new_scene_cap: int, new_obj_cap: int):
    """Host-side capacity growth (pad all block arrays; triggers one jit
    retrace). Dead slots get inert values (identity rotations, tiny opacity)."""
    import numpy as np

    g = trainables.gaussians
    Ns, No = g.scene_capacity, g.obj_capacity
    ds, do = new_scene_cap - Ns, new_obj_cap - No
    assert ds >= 0 and do >= 0

    def pad(arr, extra, fill=0.0):
        if extra == 0:
            return arr
        pad_block = jnp.full((extra,) + arr.shape[1:], fill, dtype=arr.dtype)
        return jnp.concatenate([arr, pad_block], axis=0)

    def pad_params(p: GaussianParams, zero_moments: bool) -> GaussianParams:
        def fill_for(name):
            if zero_moments:
                return 0.0
            if name.endswith("rotation"):
                return 0.0  # fixed below
            if name.endswith("opacity"):
                return -15.0
            if name.endswith("scaling"):
                return -10.0
            return 0.0
        kw = {}
        for f in _SCENE_FIELDS:
            kw[f] = pad(getattr(p, f), ds, fill_for(f))
        for f in _OBJ_FIELDS:
            kw[f] = pad(getattr(p, f), do, fill_for(f))
        out = dataclasses.replace(p, **kw)
        if not zero_moments and (ds or do):
            # identity quats on new dead slots
            sr = np.array(out.scene_rotation)
            sr[Ns:, 0] = 1.0
            orr = np.array(out.obj_rotation)
            orr[No:, 0] = 1.0
            out = dataclasses.replace(out,
                                      scene_rotation=jnp.asarray(sr),
                                      obj_rotation=jnp.asarray(orr))
        return out

    new_g = pad_params(g, zero_moments=False)
    new_m = opt_state.m._replace(gaussians=pad_params(
        opt_state.m.gaussians, zero_moments=True))
    new_v = opt_state.v._replace(gaussians=pad_params(
        opt_state.v.gaussians, zero_moments=True))
    new_state = dataclasses.replace(
        state,
        scene_alive=pad(state.scene_alive, ds, False),
        obj_alive=pad(state.obj_alive, do, False),
        gs_time=pad(state.gs_time, do, 0.0),
        max_radii2d=jnp.zeros(new_scene_cap + new_obj_cap, jnp.float32),
        xyz_grad_accum=jnp.zeros(new_scene_cap + new_obj_cap, jnp.float32),
        denom=jnp.zeros(new_scene_cap + new_obj_cap, jnp.float32),
    )
    return (trainables._replace(gaussians=new_g),
            AdamState(m=new_m, v=new_v, count=opt_state.count), new_state)
