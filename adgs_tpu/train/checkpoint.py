"""Checkpointing: reference-format PLY + deform export, and full train-state
snapshots.

Two tiers:
  1. `save_ply` / `load_ply_into`: the reference's point_cloud.ply layout
     (scene/gaussian_model.py:413-459 construct_list_of_attributes — property
     names shs_dc_i / shs_rest_i / opacity / scale_i / rot_i / obj) plus a
     `deform.npz` holding the deformation parameters that the reference
     stores in deform.pth (:448-459). Lets reference tooling consume our
     checkpoints and vice versa (a .pth bridge is provided when torch is
     importable).
  2. `save_state` / `load_state`: a full training snapshot (params, Adam
     moments + count, alive masks, stats, env map, iteration) in one npz —
     a TRUE resume, which the reference never had (SURVEY.md §5:
     "Optimizer state and iteration counter are never saved").
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..models.gaussians import (GaussianConfig, GaussianParams, GaussianState)
from ..core import splines
from .optim import AdamState, TrainableState


def _alive_np(params: GaussianParams, state: GaussianState):
    sa = np.asarray(state.scene_alive)
    oa = np.asarray(state.obj_alive)
    return sa, oa


def save_ply(path: str, params: GaussianParams, state: GaussianState,
             config: GaussianConfig) -> None:
    """Write alive Gaussians in the reference PLY layout + deform.npz."""
    from ..data.ply import write_ply
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    sa, oa = _alive_np(params, state)

    def cat(scene_f, obj_f):
        return np.concatenate([np.asarray(scene_f)[sa],
                               np.asarray(obj_f)[oa]], axis=0)

    xyz = cat(params.scene_xyz, params.obj_xyz)
    shs_dc = cat(params.scene_shs_dc, params.obj_shs_dc)      # [N,1,3]
    shs_rest = cat(params.scene_shs_rest, params.obj_shs_rest)  # [N,K-1,3]
    opac = cat(params.scene_opacity, params.obj_opacity)
    scale = cat(params.scene_scaling, params.obj_scaling)
    rot = cat(params.scene_rotation, params.obj_rotation)
    n_scene = int(sa.sum())
    obj_flag = np.concatenate([np.zeros(n_scene, np.float32),
                               np.ones(int(oa.sum()), np.float32)])

    fields = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
              "nx": np.zeros(len(xyz), np.float32),
              "ny": np.zeros(len(xyz), np.float32),
              "nz": np.zeros(len(xyz), np.float32)}
    # reference layout: torch [N,1,3].transpose(1,2).flatten -> [N, 3*1]
    dc = shs_dc.transpose(0, 2, 1).reshape(len(xyz), -1)
    for i in range(dc.shape[1]):
        fields[f"shs_dc_{i}"] = dc[:, i].astype(np.float32)
    rest = shs_rest.transpose(0, 2, 1).reshape(len(xyz), -1)
    for i in range(rest.shape[1]):
        fields[f"shs_rest_{i}"] = rest[:, i].astype(np.float32)
    fields["opacity"] = opac[:, 0].astype(np.float32)
    for i in range(3):
        fields[f"scale_{i}"] = scale[:, i].astype(np.float32)
    for i in range(4):
        fields[f"rot_{i}"] = rot[:, i].astype(np.float32)
    fields["obj"] = obj_flag
    fields = {k: np.ascontiguousarray(v, dtype=np.float32)
              for k, v in fields.items()}
    write_ply(path, fields)

    np.savez(
        os.path.join(os.path.dirname(path), "deform.npz"),
        xyz_deform=np.asarray(params.xyz_deform)[oa],
        rotation_deform=np.asarray(params.rotation_deform)[oa],
        shs_deform_scene=np.asarray(params.scene_shs_deform)[sa],
        shs_deform_obj=np.asarray(params.obj_shs_deform)[oa],
        background_deform=np.asarray(params.background_deform),
        gs_time=np.asarray(state.gs_time)[oa],
        gs_time_sigma=np.asarray(params.gs_time_sigma)[oa],
        use_time_mask=np.asarray(config.use_time_mask),
        order_args=np.asarray(json.dumps({
            "xyz": list(config.xyz), "rotation": list(config.rotation),
            "shs": list(config.shs), "background": list(config.background),
        })),
    )


def load_ply(path: str, config: GaussianConfig, capacity_quantum: int = 4096
             ) -> tuple[GaussianParams, GaussianState, GaussianConfig]:
    """Load a reference-layout PLY + deform.npz into padded pytrees
    (load_ply parity, gaussian_model.py:467-543)."""
    from ..data.ply import read_ply
    from ..models.gaussians import round_capacity, _pad
    v = read_ply(path)
    n = len(v["x"])
    xyz = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    obj_mask = v["obj"] > 0.5
    scene_mask = ~obj_mask
    K = (config.sh_degree + 1) ** 2

    dc = np.stack([v[f"shs_dc_{i}"] for i in range(3)], 1)  # [N,3]
    shs_dc = dc.reshape(n, 3, 1).transpose(0, 2, 1)          # [N,1,3]
    n_rest = 3 * (K - 1)
    rest = np.stack([v[f"shs_rest_{i}"] for i in range(n_rest)], 1)
    shs_rest = rest.reshape(n, 3, K - 1).transpose(0, 2, 1)
    opac = v["opacity"][:, None].astype(np.float32)
    scale = np.stack([v[f"scale_{i}"] for i in range(3)], 1).astype(np.float32)
    rot = np.stack([v[f"rot_{i}"] for i in range(4)], 1).astype(np.float32)

    d = np.load(os.path.join(os.path.dirname(path), "deform.npz"),
                allow_pickle=True)
    order = json.loads(str(d["order_args"]))
    config = config._replace(
        xyz=splines.BasisConfig(*order["xyz"]),
        rotation=splines.BasisConfig(*order["rotation"]),
        shs=splines.BasisConfig(*order["shs"]),
        background=splines.BasisConfig(*order["background"]),
        use_time_mask=bool(d["use_time_mask"]))

    ns, no = int(scene_mask.sum()), int(obj_mask.sum())
    Ns = round_capacity(ns, capacity_quantum)
    No = round_capacity(no, capacity_quantum)
    assert d["xyz_deform"].shape[0] == no
    assert d["xyz_deform"].shape[-1] == config.xyz.param_count

    def pad_rot(arr, cap, count):
        out = _pad(arr, cap)
        out[count:, 0] = 1.0
        return out

    params = GaussianParams(
        scene_xyz=jnp.asarray(_pad(xyz[scene_mask], Ns)),
        scene_shs_dc=jnp.asarray(_pad(shs_dc[scene_mask].astype(np.float32), Ns)),
        scene_shs_rest=jnp.asarray(_pad(shs_rest[scene_mask].astype(np.float32), Ns)),
        scene_scaling=jnp.asarray(_pad(scale[scene_mask], Ns, fill=-10.0)),
        scene_rotation=jnp.asarray(pad_rot(rot[scene_mask], Ns, ns)),
        scene_opacity=jnp.asarray(_pad(opac[scene_mask], Ns, fill=-15.0)),
        scene_shs_deform=jnp.asarray(_pad(d["shs_deform_scene"], Ns)),
        obj_xyz=jnp.asarray(_pad(xyz[obj_mask], No)),
        obj_shs_dc=jnp.asarray(_pad(shs_dc[obj_mask].astype(np.float32), No)),
        obj_shs_rest=jnp.asarray(_pad(shs_rest[obj_mask].astype(np.float32), No)),
        obj_scaling=jnp.asarray(_pad(scale[obj_mask], No, fill=-10.0)),
        obj_rotation=jnp.asarray(pad_rot(rot[obj_mask], No, no)),
        obj_opacity=jnp.asarray(_pad(opac[obj_mask], No, fill=-15.0)),
        obj_shs_deform=jnp.asarray(_pad(d["shs_deform_obj"], No)),
        xyz_deform=jnp.asarray(_pad(d["xyz_deform"], No)),
        rotation_deform=jnp.asarray(_pad(d["rotation_deform"], No)),
        gs_time_sigma=jnp.asarray(_pad(d["gs_time_sigma"], No)),
        background_deform=jnp.asarray(d["background_deform"]),
    )
    scene_alive = np.zeros(Ns, bool)
    scene_alive[:ns] = True
    obj_alive = np.zeros(No, bool)
    obj_alive[:no] = True
    state = GaussianState(
        scene_alive=jnp.asarray(scene_alive),
        obj_alive=jnp.asarray(obj_alive),
        gs_time=jnp.asarray(_pad(d["gs_time"], No)),
        max_radii2d=jnp.zeros(Ns + No, jnp.float32),
        xyz_grad_accum=jnp.zeros(Ns + No, jnp.float32),
        denom=jnp.zeros(Ns + No, jnp.float32),
        obj_near_idx=jnp.zeros((1, 1), jnp.int32),
        obj_near_valid=jnp.zeros((1,), bool),
    )
    return params, state, config


def save_state(path: str, trainables: TrainableState, opt_state: AdamState,
               state: GaussianState, iteration: int,
               extras: Optional[dict] = None) -> None:
    """Full training snapshot -> one .npz."""
    import jax
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}

    def put(prefix, tree):
        leaves, _ = jax.tree.flatten(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{prefix}.{i}"] = np.asarray(leaf)

    put("params", trainables.gaussians)
    put("env", trainables.env)
    put("adam_m", opt_state.m)
    put("adam_v", opt_state.v)
    put("state", state)
    arrays["adam_count"] = np.asarray(opt_state.count)
    arrays["iteration"] = np.asarray(iteration)
    if extras:
        for k, val in extras.items():
            arrays[f"extra.{k}"] = np.asarray(val)
    np.savez(path, **arrays)


def load_state(path: str, template_trainables: TrainableState,
               template_opt: AdamState, template_state: GaussianState):
    """Restore a snapshot saved by save_state (templates give the pytree
    structure; shapes must match — same capacity)."""
    import jax
    z = np.load(path, allow_pickle=False)

    def get(prefix, tree):
        leaves, treedef = jax.tree.flatten(tree)
        out = [jnp.asarray(z[f"{prefix}.{i}"]) for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, out)

    trainables = TrainableState(
        gaussians=get("params", template_trainables.gaussians),
        env=get("env", template_trainables.env))
    opt_state = AdamState(m=get("adam_m", template_opt.m),
                          v=get("adam_v", template_opt.v),
                          count=jnp.asarray(z["adam_count"]))
    state = get("state", template_state)
    return trainables, opt_state, state, int(z["iteration"])
