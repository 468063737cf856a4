"""Repro: bench train step with active KNN-reg groups (TPU device error)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import dataclasses as dc

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge
from adgs_tpu.ops.flow import FlowPackage
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train.losses import FrameBatch
from adgs_tpu.train.optim import TrainableState, init_adam
from adgs_tpu.train.step import make_train_step
from adgs_tpu.render import compute_binning
from adgs_tpu.ops import knn as knn_lib

N = int(os.environ.get("RN", 1_000_000))
W, H = 1242, 375
print("backend:", jax.default_backend(), flush=True)
params, state, cfg, cam, env, rays = ge._build_scene(
    n_points=N, width=W, height=H, quantum=max(4096, N // 64))
_shr = float(np.log(0.3))
params = dc.replace(params, scene_scaling=params.scene_scaling + _shr,
                    obj_scaling=params.obj_scaling + _shr)
nr = int(jax.jit(lambda p, s: compute_binning(
    cam, p, s, cfg, active_sh_degree=3, capacity=1 << 10).num_rendered)(params, state))
cap = -(-int(nr / 0.8) // 4096) * 4096
print("nr", nr, "cap", cap, flush=True)
opt = OptimizationConfig()
step = make_train_step(cfg, opt, frame_gap=1.0/60, scene_extent=20.0,
                       cameras_extent=10.0, capacity=cap,
                       max_per_tile=4096, chunk=64,
                       backend=os.environ.get("RB", "auto"))
rng = np.random.default_rng(1)
fx = 0.5 * W / np.tan(0.6)
K = np.array([[fx, 0, W/2], [0, fx, H/2], [0, 0, 1]], np.float32)
batch = FrameBatch(
    image=jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32),
    depth=jnp.ones((H, W), jnp.float32),
    sky=jnp.zeros((H, W), jnp.float32),
    semantic=jnp.asarray(rng.random((H, W)) < 0.3, jnp.float32),
    flow=FlowPackage(time=jnp.float32(0.35), K=jnp.asarray(K),
                     R=jnp.eye(3, dtype=jnp.float32), T=jnp.zeros(3, jnp.float32),
                     flow=jnp.asarray(rng.uniform(size=(2, H, W)), jnp.float32)*W,
                     vis=jnp.ones((H, W), jnp.float32)),
    flow_valid=jnp.asarray(True))
opt_state = init_adam(TrainableState(gaussians=params, env=env))

k_nn = opt.near_num
a_cap = max(1, params.obj_capacity // k_nn)
print("obj_capacity", params.obj_capacity, "a_cap", a_cap, flush=True)
idxg, validg = knn_lib.near_idx_device(
    params.obj_xyz, state.obj_alive, jax.random.PRNGKey(7), k_nn, a_cap)
jax.block_until_ready((idxg, validg))
print("near_idx ok; valid:", int(jnp.sum(validg)), flush=True)
state_reg = dc.replace(state, obj_near_idx=idxg, obj_near_valid=validg)
out = step(params, env, opt_state, state_reg, cam, batch, rays,
           jnp.float32(1000), active_sh_degree=3)
jax.block_until_ready(out)
print("reg step 1 OK, loss", float(out[-1]["total_loss"]), flush=True)
for i in range(3):
    params, env, opt_state, state_reg = out[:4]
    out = step(params, env, opt_state, state_reg, cam, batch, rays,
               jnp.float32(1000), active_sh_degree=3)
jax.block_until_ready(out)
print("reg steps OK, loss", float(out[-1]["total_loss"]), flush=True)
