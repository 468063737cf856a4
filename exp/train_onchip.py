"""End-to-end Trainer validation ON CHIP: a tiny synthetic KITTI scene
trained ~60 iterations compiled on the real TPU — the full orchestration
(staged jits, densify, near-idx refresh with REAL groups, λ_reg active)
that interpret-mode tests can never exercise.

Run: python exp/train_onchip.py   (~5-10 min incl. compiles)
"""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("backend:", jax.default_backend(), flush=True)
from tests.test_data_cli import make_kitti_scene
from adgs_tpu.data.readers import read_scene
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train.trainer import Trainer

with tempfile.TemporaryDirectory() as td:
    scene = read_scene(make_kitti_scene(
        os.path.join(td, "scene"), width=256, height=160, n_frames=4,
        n_pts=3000))
    opt = OptimizationConfig(
        iterations=60, densify_from_iter=10, densification_interval=20,
        densify_until_iter=100, opacity_reset_interval=10_000,
        near_idx_reset_interval=15, data_sample="order", lambda_flow=0.0)
    tr = Trainer(scene, opt, os.path.join(td, "out"), capacity=1 << 15,
                 env_resolution=512, capacity_quantum=1024)
    import jax.numpy as jnp
    l0 = None
    tr.train(iterations=60, save_iterations=[60], test_iterations=[])
    import json
    with open(os.path.join(td, "out", "metrics.jsonl")) as f:
        rows = [json.loads(r) for r in f]
    losses = [r["total_loss"] for r in rows if "total_loss" in r]
    print(f"losses: first {losses[0]:.4f} last {losses[-1]:.4f} "
          f"({len(losses)} recorded)", flush=True)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "loss did not decrease on chip"
    assert os.path.exists(os.path.join(
        td, "out", "point_cloud", "iteration_60", "train_state.npz"))
    print("ON-CHIP TRAINER OK", flush=True)
