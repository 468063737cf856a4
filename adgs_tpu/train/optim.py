"""Per-group Adam with exponential LR schedules, on padded pytrees.

Replicates the reference's 18 Adam parameter groups
(scene/gaussian_model.py:346-392, env.py:78-83) and the Plenoxels-style
log-linear LR decay (utils/general_utils.py:29-62). Implemented as a single
Adam over the GaussianParams + EnvironmentMap pytree with a PER-LEAF learning
rate computed from the iteration inside jit — the group structure becomes a
pytree of schedule functions, so the moment state lives in the same padded
layout as the parameters and densification surgery (train/densify.py) is a
masked scatter on (params, m, v) together.

torch.optim.Adam parity: b1=0.9, b2=0.999, eps=1e-15 (added OUTSIDE the
sqrt, matching torch), bias correction by step count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from ..models.env_map import EnvironmentMap
from .config import OptimizationConfig

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15


def expon_lr(step: jnp.ndarray, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000) -> jnp.ndarray:
    """get_expon_lr_func (utils/general_utils.py:29-62), traced-step safe."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.asarray(0.0, dtype=jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    return jnp.where(step < 0, 0.0, delay * log_lerp).astype(jnp.float32)


class TrainableState(NamedTuple):
    """Everything Adam updates together."""

    gaussians: GaussianParams
    env: EnvironmentMap


class AdamState(NamedTuple):
    m: TrainableState
    v: TrainableState
    count: jnp.ndarray  # scalar int32


def init_adam(trainables: TrainableState) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, trainables)
    return AdamState(m=zeros, v=zeros, count=jnp.int32(0))


def lr_tree(opt: OptimizationConfig, scene_extent: float,
            cameras_extent: float, step: jnp.ndarray) -> TrainableState:
    """Per-leaf LR pytree — the group table of training_setup
    (gaussian_model.py:346-392). Scheduled groups: scene_xyz &
    deform_background (cameras_extent), obj_xyz (object_extent),
    deform_xyz (scene_extent)."""
    obj_extent = opt.object_extent
    cam_ext = max(cameras_extent, opt.min_camera_extent)

    def sched(scale):
        return expon_lr(step,
                        opt.position_lr_init * scale,
                        opt.position_lr_final * scale,
                        lr_delay_mult=opt.position_lr_delay_mult,
                        max_steps=opt.position_lr_max_steps)

    scene_xyz_lr = sched(cam_ext * opt.scene_position_lr_scale)
    obj_xyz_lr = sched(obj_extent * opt.obj_position_lr_scale)
    deform_xyz_lr = sched(scene_extent * opt.position_deform_lr_scale)

    f = jnp.float32
    g = GaussianParams(
        scene_xyz=scene_xyz_lr,
        scene_shs_dc=f(opt.feature_lr),
        scene_shs_rest=f(opt.feature_lr / 20.0),
        scene_scaling=f(opt.scaling_lr),
        scene_rotation=f(opt.rotation_lr),
        scene_opacity=f(opt.opacity_lr),
        scene_shs_deform=f(opt.shs_deform_lr),
        obj_xyz=obj_xyz_lr,
        obj_shs_dc=f(opt.feature_lr),
        obj_shs_rest=f(opt.feature_lr / 20.0),
        obj_scaling=f(opt.scaling_lr),
        obj_rotation=f(opt.rotation_lr),
        obj_opacity=f(opt.opacity_lr),
        obj_shs_deform=f(opt.shs_deform_lr),
        xyz_deform=deform_xyz_lr,
        rotation_deform=f(opt.rotation_deform_lr),
        gs_time_sigma=f(opt.gs_time_sigma_lr),
        background_deform=scene_xyz_lr,
    )
    return TrainableState(gaussians=g, env=EnvironmentMap(grid=f(opt.env_lr)))


def adam_update(trainables: TrainableState, grads: TrainableState,
                opt_state: AdamState, lrs: TrainableState
                ) -> tuple[TrainableState, AdamState]:
    count = opt_state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** c
    bc2 = 1.0 - ADAM_B2 ** c

    def upd(p, g, m, v, lr):
        m = ADAM_B1 * m + (1 - ADAM_B1) * g
        v = ADAM_B2 * v + (1 - ADAM_B2) * (g * g)
        step = lr * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS)
        return p - step, m, v

    flat_p, treedef = jax.tree.flatten(trainables)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(opt_state.m)
    flat_v = jax.tree.leaves(opt_state.v)
    flat_lr = jax.tree.leaves(lrs)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr):
        p2, m2, v2 = upd(p, g, m, v, lr)
        new_p.append(p2)
        new_m.append(m2)
        new_v.append(v2)
    return (jax.tree.unflatten(treedef, new_p),
            AdamState(m=jax.tree.unflatten(treedef, new_m),
                      v=jax.tree.unflatten(treedef, new_v),
                      count=count))
