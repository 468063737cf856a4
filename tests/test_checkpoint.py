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


class TestReferenceBridge:
    """tools/convert_reference_ckpt.py roundtrip: our deform.npz <-> the
    reference's torch-pickled deform.pth (scene/gaussian_model.py:448-459),
    exercised in BOTH directions against a real torch payload."""

    @staticmethod
    def _tool():
        import importlib.util
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "tools",
                            "convert_reference_ckpt.py")
        spec = importlib.util.spec_from_file_location("_convert_tool", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_export_import_roundtrip(self, rng, tmp_path):
        torch = __import__("pytest").importorskip("torch")
        tool = self._tool()
        params, state, cfg, _ = tiny_model(rng, n=60)
        d = str(tmp_path)
        path = str(tmp_path / "point_cloud.ply")
        ckpt.save_ply(path, params, state, cfg)

        # our npz -> reference deform.pth: the 10-tuple contract
        tool.do_export(d)
        payload = torch.load(str(tmp_path / "deform.pth"),
                             map_location="cpu", weights_only=False)
        assert len(payload) == 10
        (xyz_d, rot_d, shs_s, shs_o, bg_d, gs_time, gs_sigma,
         use_mask, order_args, scene_extent) = payload
        z = np.load(str(tmp_path / "deform.npz"), allow_pickle=True)
        np.testing.assert_array_equal(xyz_d.detach().numpy(),
                                      z["xyz_deform"])
        np.testing.assert_array_equal(bg_d.detach().numpy(),
                                      z["background_deform"])
        assert gs_time.shape == (z["gs_time"].shape[0], 1)
        assert isinstance(order_args, dict) and set(order_args) == {
            "xyz", "rotation", "shs", "background"}
        assert list(order_args["xyz"]) == list(cfg.xyz)

        # reference deform.pth -> our npz: regenerate and reload
        (tmp_path / "deform.npz").unlink()
        tool.do_import(d)
        params2, state2, cfg2 = ckpt.load_ply(path, cfg, capacity_quantum=32)
        assert cfg2.xyz == cfg.xyz
        cam = fx.make_camera(width=32, height=32, time=0.4)
        out1 = render_lib.render(cam, params, state, cfg,
                                 capacity=1 << 12, max_per_tile=128)
        out2 = render_lib.render(cam, params2, state2, cfg2,
                                 capacity=1 << 12, max_per_tile=128)
        np.testing.assert_allclose(out2["render"], out1["render"],
                                   rtol=1e-5, atol=1e-5)

    def test_import_from_reference_style_payload(self, rng, tmp_path):
        """A deform.pth built the way the REFERENCE builds it (torch
        Parameters, [N,1] gs_time, plain dict order_args) must import."""
        torch = __import__("pytest").importorskip("torch")
        tool = self._tool()
        params, state, cfg, _ = tiny_model(rng, n=60)
        path = str(tmp_path / "point_cloud.ply")
        ckpt.save_ply(path, params, state, cfg)
        z = np.load(str(tmp_path / "deform.npz"), allow_pickle=True)
        no = z["xyz_deform"].shape[0]
        payload = (
            torch.nn.Parameter(torch.tensor(z["xyz_deform"])),
            torch.nn.Parameter(torch.tensor(z["rotation_deform"])),
            torch.nn.Parameter(torch.tensor(z["shs_deform_scene"])),
            torch.nn.Parameter(torch.tensor(z["shs_deform_obj"])),
            torch.nn.Parameter(torch.tensor(z["background_deform"])),
            torch.tensor(z["gs_time"]).reshape(no, 1),
            torch.nn.Parameter(torch.tensor(z["gs_time_sigma"])),
            bool(z["use_time_mask"]),
            {"xyz": list(cfg.xyz), "rotation": list(cfg.rotation),
             "shs": list(cfg.shs), "background": list(cfg.background)},
            42.0,
        )
        torch.save(payload, str(tmp_path / "deform.pth"))
        (tmp_path / "deform.npz").unlink()
        tool.do_import(str(tmp_path))
        params2, state2, cfg2 = ckpt.load_ply(path, cfg, capacity_quantum=32)
        np.testing.assert_array_equal(np.asarray(params2.xyz_deform),
                                      np.asarray(params.xyz_deform))
        np.testing.assert_array_equal(np.asarray(state2.gs_time),
                                      np.asarray(state.gs_time))
