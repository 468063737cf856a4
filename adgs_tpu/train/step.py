"""The jitted training step: render -> losses -> grads -> Adam -> stats.

One call replicates one iteration of the reference loop (train.py:47-167)
minus the host-side concerns (camera sampling, densify scheduling, logging),
which live in the trainer. The whole step — forward render, all losses,
backward, optimizer update, densification-stat accumulation — is a single
compiled XLA program.

Densification stats: the reference reads screenspace_points.grad
(train.py:151-152, gaussian_model.py:863-867); here the zero screen_offset
input is differentiated alongside the parameters and its gradient norm is
accumulated into GaussianState.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..models.env_map import EnvironmentMap
from ..models.gaussians import GaussianConfig, GaussianParams, GaussianState
from ..render import render
from .config import OptimizationConfig
from .losses import FrameBatch, compute_losses
from .optim import AdamState, TrainableState, adam_update, lr_tree


def make_train_step(
    config: GaussianConfig,
    opt: OptimizationConfig,
    frame_gap: float,
    scene_extent: float,
    cameras_extent: float,
    backend: str = "auto",
    capacity: int = 1 << 18,
    max_per_tile: int = 2048,
    chunk: int = 32,
    inv_depth: bool = True,
):
    """Returns step(params, env, opt_state, state, camera, batch, cam_rays,
    iteration, active_sh_degree) -> (params, env, opt_state, state, logs).

    `active_sh_degree` and the presence of batch.flow are static (a handful
    of retraces over a run, matching oneupSHdegree train.py:50-52)."""

    render_objmask = opt.lambda_obj > 0.0

    from ..render import compute_binning

    @functools.partial(jax.jit, static_argnames=("active_sh_degree",))
    def bin_step(params, state, camera, active_sh_degree: int = 3):
        return compute_binning(camera, params, state, config,
                               active_sh_degree=active_sh_degree,
                               inv_depth=inv_depth, capacity=capacity)

    @functools.partial(jax.jit, static_argnames=("active_sh_degree",))
    def grad_step(params: GaussianParams, env: EnvironmentMap,
                  opt_state: AdamState, state: GaussianState,
                  camera: Camera, batch: FrameBatch, cam_rays: jnp.ndarray,
                  iteration: jnp.ndarray, binning,
                  active_sh_degree: int = 3):
        so = jnp.zeros((params.capacity, 2), dtype=jnp.float32)

        def loss_fn(trainables: TrainableState, so):
            flow_time = batch.flow.time if batch.flow is not None else None
            pkg = render(
                camera, trainables.gaussians, state, config,
                env_map=trainables.env, cam_rays=cam_rays,
                flow_time=flow_time, render_objmask=render_objmask,
                screen_offset=so, active_sh_degree=active_sh_degree,
                inv_depth=inv_depth, backend=backend, capacity=capacity,
                max_per_tile=max_per_tile, chunk=chunk,
                precomputed_binning=binning)
            total, logs = compute_losses(
                pkg, batch, trainables.gaussians, state, config, opt,
                frame_gap, scene_extent)
            aux = (logs, pkg["radii"], pkg["visibility_filter"])
            return total, aux

        trainables = TrainableState(gaussians=params, env=env)
        (loss, (logs, radii, vis)), (grads, so_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(trainables, so)

        lrs = lr_tree(opt, scene_extent, cameras_extent, iteration)
        new_trainables, new_opt_state = adam_update(
            trainables, grads, opt_state, lrs)

        # densification stats (train.py:148-152, gaussian_model.py:863-867)
        visf = vis.astype(jnp.float32)
        snorm = jnp.linalg.norm(so_grad, axis=-1)
        new_state = dataclasses.replace(
            state,
            max_radii2d=jnp.maximum(state.max_radii2d,
                                    jnp.where(vis, radii.astype(jnp.float32),
                                              0.0)),
            xyz_grad_accum=state.xyz_grad_accum + snorm * visf,
            denom=state.denom + visf,
        )
        return (new_trainables.gaussians, new_trainables.env, new_opt_state,
                new_state, logs)

    def step(params, env, opt_state, state, camera, batch, cam_rays,
             iteration, active_sh_degree: int = 3):
        """Two jitted dispatches: the integer binning pipeline, then the
        differentiable render/loss/optimizer step (compile-time bounded —
        crucial for the Pallas backend on TPU)."""
        binning = bin_step(params, state, camera,
                           active_sh_degree=active_sh_degree)
        params, env, opt_state, state, logs = grad_step(
            params, env, opt_state, state, camera, batch,
            cam_rays, iteration, binning,
            active_sh_degree=active_sh_degree)
        # surfaced for the trainer's instance-capacity autotuner (the
        # reference sizes buffers exactly per frame, rasterizer_impl.cu:
        # 284-305; here capacity is static so overflow drives growth)
        logs = dict(logs, num_rendered=binning.num_rendered)
        return params, env, opt_state, state, logs

    return step
