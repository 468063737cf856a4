"""Data-parallel multi-camera training: a batch of frames per step, sharded
over the mesh's "data" axis.

New TPU-native scope (the reference trains strictly one camera per
iteration, train.py:54-61): the per-camera render+loss is vmapped over a
stacked camera batch, batch-sharded with GSPMD (params replicated; XLA
inserts the gradient psum), and densification statistics accumulate the
whole batch — B cameras per step behave like B reference iterations of
stats. Uses the portable XLA rasterizer path, which partitions cleanly
along the leading batch dimension; combine with parallel/shard.py (tile
sharding) on a 2D mesh for batch x tile parallelism of large frames.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import Camera
from ..models.env_map import EnvironmentMap
from ..models.gaussians import GaussianConfig, GaussianParams, GaussianState
from ..render import render
from ..train.config import OptimizationConfig
from ..train.losses import FrameBatch, compute_losses
from ..train.optim import AdamState, TrainableState, adam_update, lr_tree


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack per-frame array fields; static fields must match."""
    assert all(c.width == cams[0].width and c.height == cams[0].height
               for c in cams)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def stack_batches(batches: list[FrameBatch]) -> FrameBatch:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def make_dp_train_step(
    config: GaussianConfig,
    opt: OptimizationConfig,
    frame_gap: float,
    scene_extent: float,
    cameras_extent: float,
    mesh: Mesh,
    axis: str = "data",
    capacity: int = 1 << 18,
    max_per_tile: int = 2048,
    chunk: int = 32,
    inv_depth: bool = True,
    backend: str = "xla",
):
    """step(params, env, opt_state, state, cameras[B], batches[B], rays[B],
    iteration, active_sh_degree) with the B axis sharded over `axis`.

    backend defaults to "xla" (not "auto"): this step vmaps the render,
    and the Mosaic scalar-prefetch pallas_calls' batching path is only
    exercised in interpreter mode by tests/test_data_parallel.py — opt in
    to "pallas" explicitly when running it compiled."""

    render_objmask = opt.lambda_obj > 0.0
    batch_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, static_argnames=("active_sh_degree",))
    def step(params: GaussianParams, env: EnvironmentMap,
             opt_state: AdamState, state: GaussianState,
             cameras: Camera, batches: FrameBatch, rays: jnp.ndarray,
             iteration: jnp.ndarray, active_sh_degree: int = 3):
        B = rays.shape[0]
        cameras = jax.lax.with_sharding_constraint(cameras, batch_sharding)
        batches = jax.lax.with_sharding_constraint(batches, batch_sharding)
        rays = jax.lax.with_sharding_constraint(rays, batch_sharding)
        so = jnp.zeros((B, params.capacity, 2), dtype=jnp.float32)

        def one_camera(trainables, cam, batch, ray, so_b):
            flow_time = batch.flow.time if batch.flow is not None else None
            pkg = render(
                cam, trainables.gaussians, state, config,
                env_map=trainables.env, cam_rays=ray, flow_time=flow_time,
                render_objmask=render_objmask, screen_offset=so_b,
                active_sh_degree=active_sh_degree, inv_depth=inv_depth,
                backend=backend, capacity=capacity,
                max_per_tile=max_per_tile, chunk=chunk)
            total, logs = compute_losses(
                pkg, batch, trainables.gaussians, state, config, opt,
                frame_gap, scene_extent)
            return total, (logs, pkg["radii"], pkg["visibility_filter"])

        def loss_fn(trainables, so):
            totals, (logs, radii, vis) = jax.vmap(
                one_camera, in_axes=(None, 0, 0, 0, 0))(
                    trainables, cameras, batches, rays, so)
            return jnp.mean(totals), (jax.tree.map(jnp.mean, logs),
                                      radii, vis)

        trainables = TrainableState(gaussians=params, env=env)
        (loss, (logs, radii, vis)), (grads, so_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(trainables, so)

        lrs = lr_tree(opt, scene_extent, cameras_extent, iteration)
        new_trainables, new_opt_state = adam_update(
            trainables, grads, opt_state, lrs)

        # densification stats over the whole batch (B reference iterations)
        # note: dL/dso scales with 1/B through the mean; undo so thresholds
        # keep their single-camera meaning
        visf = vis.astype(jnp.float32)
        snorm = jnp.linalg.norm(so_grad * B, axis=-1)
        new_state = dataclasses.replace(
            state,
            max_radii2d=jnp.maximum(
                state.max_radii2d,
                jnp.max(jnp.where(vis, radii.astype(jnp.float32), 0.0),
                        axis=0)),
            xyz_grad_accum=state.xyz_grad_accum + jnp.sum(snorm * visf,
                                                          axis=0),
            denom=state.denom + jnp.sum(visf, axis=0),
        )
        return (new_trainables.gaussians, new_trainables.env, new_opt_state,
                new_state, logs)

    return step
