"""Checkpoint round-trip tests: reference-format PLY + deform, full state."""

import numpy as np
import jax
import jax.numpy as jnp

from adgs_tpu.models.env_map import EnvironmentMap
from adgs_tpu.train import checkpoint as ckpt
from adgs_tpu.train.optim import TrainableState, init_adam
from adgs_tpu import render as render_lib
from tests import scene_fixtures as fx
from tests.test_models_ops import tiny_model


class TestPlyCheckpoint:
    def test_roundtrip_preserves_render(self, rng, tmp_path):
        params, state, cfg, _ = tiny_model(rng, n=60)
        path = str(tmp_path / "point_cloud.ply")
        ckpt.save_ply(path, params, state, cfg)
        params2, state2, cfg2 = ckpt.load_ply(path, cfg, capacity_quantum=32)

        assert cfg2.xyz == cfg.xyz and cfg2.rotation == cfg.rotation
        assert int(state2.num_scene) == int(state.num_scene)
        assert int(state2.num_obj) == int(state.num_obj)

        cam = fx.make_camera(width=32, height=32, time=0.4)
        out1 = render_lib.render(cam, params, state, cfg,
                                 capacity=1 << 12, max_per_tile=128)
        out2 = render_lib.render(cam, params2, state2, cfg2,
                                 capacity=1 << 12, max_per_tile=128)
        np.testing.assert_allclose(out2["render"], out1["render"],
                                   rtol=1e-5, atol=1e-5)

    def test_roundtrip_after_densify_holes(self, rng, tmp_path):
        """Alive masks with holes (post-prune) must save/load compactly."""
        import dataclasses
        params, state, cfg, _ = tiny_model(rng, n=60)
        sa = np.array(state.scene_alive)
        alive_idx = np.nonzero(sa)[0]
        sa[alive_idx[::3]] = False  # punch holes
        state = dataclasses.replace(state, scene_alive=jnp.asarray(sa))
        path = str(tmp_path / "point_cloud.ply")
        ckpt.save_ply(path, params, state, cfg)
        params2, state2, _ = ckpt.load_ply(path, cfg, capacity_quantum=32)
        assert int(state2.num_scene) == int(sa.sum())

        cam = fx.make_camera(width=32, height=32, time=0.2)
        out1 = render_lib.render(cam, params, state, cfg,
                                 capacity=1 << 12, max_per_tile=128)
        out2 = render_lib.render(cam, params2, state2, cfg,
                                 capacity=1 << 12, max_per_tile=128)
        np.testing.assert_allclose(out2["render"], out1["render"],
                                   rtol=1e-5, atol=1e-5)


class TestFullState:
    def test_save_load_state(self, rng, tmp_path):
        params, state, cfg, _ = tiny_model(rng, n=40)
        env = EnvironmentMap.create(16)
        tr = TrainableState(gaussians=params, env=env)
        opt_state = init_adam(tr)
        import dataclasses
        opt_state = opt_state._replace(count=jnp.int32(1234))
        path = str(tmp_path / "train_state.npz")
        ckpt.save_state(path, tr, opt_state, state, iteration=777)

        tr2, opt2, state2, it = ckpt.load_state(path, tr, opt_state, state)
        assert it == 777
        assert int(opt2.count) == 1234
        np.testing.assert_array_equal(tr2.gaussians.scene_xyz,
                                      tr.gaussians.scene_xyz)
        np.testing.assert_array_equal(np.asarray(state2.scene_alive),
                                      np.asarray(state.scene_alive))
        np.testing.assert_array_equal(tr2.env.grid, tr.env.grid)
