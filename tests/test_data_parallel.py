"""Data-parallel (multi-camera batch) training tests on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adgs_tpu.models import gaussians as gm
from adgs_tpu.models.env_map import EnvironmentMap, camera_rays
from adgs_tpu.parallel import make_mesh
from adgs_tpu.parallel.data_parallel import (make_dp_train_step,
                                             stack_batches, stack_cameras)
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train.losses import FrameBatch
from adgs_tpu.train.optim import TrainableState, init_adam
from adgs_tpu.train.step import make_train_step
from tests import scene_fixtures as fx
from tests.test_models_ops import tiny_model


import pytest


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_dp_step_matches_mean_of_cameras(rng, backend):
    mesh = make_mesh({"data": 8})
    params, state, cfg, _ = tiny_model(rng, n=80, quantum=128)
    env = EnvironmentMap.create(resolution=16)
    H = W = 32
    opt = OptimizationConfig(lambda_depth=0.1, lambda_flow=0.0,
                             lambda_obj=0.0, lambda_sky=0.05,
                             lambda_sigma=0.0, lambda_reg=0.0,
                             lambda_sigma_reg=0.0)
    kw = dict(frame_gap=0.05, scene_extent=10.0, cameras_extent=10.0,
              capacity=1 << 12, max_per_tile=128, backend=backend)

    cams, batches, rays = [], [], []
    for b in range(8):
        cam = fx.make_camera(width=W, height=H, time=0.1 * b,
                             rng=np.random.default_rng(b))
        cams.append(cam)
        batches.append(FrameBatch(
            image=jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32),
            depth=jnp.asarray(rng.uniform(size=(H, W)), jnp.float32),
            sky=jnp.zeros((H, W), jnp.float32),
            semantic=jnp.zeros((H, W), jnp.float32)))
        rays.append(jnp.asarray(camera_rays(cam.focal_x, H, W), jnp.float32))

    dp_step = make_dp_train_step(cfg, opt, mesh=mesh, **kw)
    opt_state = init_adam(TrainableState(gaussians=params, env=env))
    p2, e2, o2, s2, logs = dp_step(
        params, env, opt_state, state, stack_cameras(cams),
        stack_batches(batches), jnp.stack(rays), jnp.float32(1),
        active_sh_degree=0)

    # reference: mean of per-camera losses via the single-camera step's loss
    sstep = make_train_step(cfg, opt, **kw)
    singles = []
    for cam, batch, ray in zip(cams, batches, rays):
        _, _, _, _, l = sstep(params, env, opt_state, state, cam, batch,
                              ray, jnp.float32(1), active_sh_degree=0)
        singles.append(float(l["total_loss"]))
    np.testing.assert_allclose(float(logs["total_loss"]), np.mean(singles),
                               rtol=1e-4)
    # params moved and stats accumulated across the batch
    assert not np.allclose(np.asarray(p2.scene_opacity),
                           np.asarray(params.scene_opacity))
    assert float(jnp.max(s2.denom)) >= 2.0  # visible in several cameras
    assert np.all(np.isfinite(np.asarray(p2.scene_xyz)))


def _dp_tile_inputs(rng, B, H, W):
    params, state, cfg, _ = tiny_model(rng, n=80, quantum=128)
    env = EnvironmentMap.create(resolution=16)
    opt = OptimizationConfig(lambda_depth=0.1, lambda_flow=0.0,
                             lambda_obj=0.0, lambda_sky=0.05,
                             lambda_sigma=0.0, lambda_reg=0.0,
                             lambda_sigma_reg=0.0)
    cams, batches, rays = [], [], []
    for b in range(B):
        cam = fx.make_camera(width=W, height=H, time=0.1 * b,
                             rng=np.random.default_rng(b))
        cams.append(cam)
        batches.append(FrameBatch(
            image=jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32),
            depth=jnp.asarray(rng.uniform(size=(H, W)), jnp.float32),
            sky=jnp.zeros((H, W), jnp.float32),
            semantic=jnp.zeros((H, W), jnp.float32)))
        rays.append(jnp.asarray(camera_rays(cam.focal_x, H, W), jnp.float32))
    return params, state, cfg, env, opt, cams, batches, rays


@pytest.mark.parametrize("shape", [{"data": 2, "tile": 4},
                                   {"data": 4, "tile": 2},
                                   {"data": 8, "tile": 1}])
def test_dp_tile_2d_mesh_matches_single_device(rng, shape):
    """Camera-batch x tile-slab composition (shard.py data_axis): the 2-D
    mesh step's loss equals the camera mean of single-device steps and the
    densify stats accumulate like B reference iterations."""
    from adgs_tpu.parallel.shard import make_sharded_train_step

    B, H, W = shape["data"], 64, 48
    params, state, cfg, env, opt, cams, batches, rays = _dp_tile_inputs(
        rng, B, H, W)
    mesh = make_mesh(shape)
    kw = dict(frame_gap=0.05, scene_extent=10.0, cameras_extent=10.0,
              capacity=1 << 12, max_per_tile=128, backend="pallas")

    dstep = make_sharded_train_step(cfg, opt, mesh=mesh, axis="tile",
                                    data_axis="data", **kw)
    opt_state = init_adam(TrainableState(gaussians=params, env=env))
    p2, e2, o2, s2, logs = dstep(
        params, env, opt_state, state, stack_cameras(cams),
        stack_batches(batches), jnp.stack(rays), jnp.float32(1),
        active_sh_degree=0)

    sstep = make_train_step(cfg, opt, **kw)
    singles, stats = [], []
    for cam, batch, ray in zip(cams, batches, rays):
        _, _, _, s1, l = sstep(params, env, opt_state, state, cam, batch,
                               ray, jnp.float32(1), active_sh_degree=0)
        singles.append(float(l["total_loss"]))
        stats.append(s1)
    np.testing.assert_allclose(float(logs["total_loss"]), np.mean(singles),
                               rtol=1e-4)
    # B-iterations-worth of densify statistics
    np.testing.assert_allclose(
        np.asarray(s2.denom),
        np.sum([np.asarray(s.denom) for s in stats], axis=0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2.max_radii2d),
        np.max([np.asarray(s.max_radii2d) for s in stats], axis=0),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2.xyz_grad_accum),
        np.sum([np.asarray(s.xyz_grad_accum) for s in stats], axis=0),
        rtol=2e-3, atol=1e-6)
    # gradients applied: params moved identically-shaped and finite
    assert not np.allclose(np.asarray(p2.scene_opacity),
                           np.asarray(params.scene_opacity))
    assert np.all(np.isfinite(np.asarray(p2.scene_xyz)))
