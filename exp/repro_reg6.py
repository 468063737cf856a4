"""Which segreduce instance faults in-step? Arm A: MXU for xyz (Gc=96)
only, tier2 for sigma. Run with ARM=A|B (B: MXU for sigma Gc=8 only)."""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import dataclasses as dc
import __graft_entry__ as ge
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train import losses as L
from adgs_tpu.train.losses import FrameBatch
from adgs_tpu.train.optim import TrainableState, init_adam
from adgs_tpu.train.step import make_train_step
from adgs_tpu.render import compute_binning
from adgs_tpu.ops import knn as knn_lib
from adgs_tpu.ops.flow import FlowPackage

ARM = os.environ.get("ARM", "A")
orig = L._group_variance_loss
def patched(values, idx, valid):
    big = values.shape[1:] == (3, 32) or (values.ndim == 2 and values.shape[1] > 8)
    use_mxu = (ARM == "A") == bool(values.shape[1:] != (2,))
    L.REG_MXU = 1 if use_mxu else 2
    try:
        return orig(values, idx, valid)
    finally:
        L.REG_MXU = 2
L._group_variance_loss = patched
import adgs_tpu.train.losses as _m
# gaussian_term_losses/compute_losses reference the module attr at call time
N = 1_000_000
print("backend:", jax.default_backend(), "ARM", ARM, flush=True)
params, state, cfg, cam, env, rays = ge._build_scene(
    n_points=N, width=1242, height=375, quantum=max(4096, N // 64))
_shr = float(np.log(0.3))
params = dc.replace(params, scene_scaling=params.scene_scaling + _shr,
                    obj_scaling=params.obj_scaling + _shr)
nr = int(jax.jit(lambda p, s: compute_binning(
    cam, p, s, cfg, active_sh_degree=3, capacity=1 << 10).num_rendered)(params, state))
cap = -(-int(nr / 0.8) // 4096) * 4096
opt = OptimizationConfig()
step = make_train_step(cfg, opt, frame_gap=1.0/60, scene_extent=20.0,
                       cameras_extent=10.0, capacity=cap,
                       max_per_tile=4096, chunk=64)
rng = np.random.default_rng(1)
fx = 0.5 * 1242 / np.tan(0.6)
Km = np.array([[fx, 0, 621], [0, fx, 187.5], [0, 0, 1]], np.float32)
H, W = 375, 1242
batch = FrameBatch(
    image=jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32),
    depth=jnp.ones((H, W), jnp.float32),
    sky=jnp.zeros((H, W), jnp.float32),
    semantic=jnp.asarray(rng.random((H, W)) < 0.3, jnp.float32),
    flow=FlowPackage(time=jnp.float32(0.35), K=jnp.asarray(Km),
                     R=jnp.eye(3, dtype=jnp.float32), T=jnp.zeros(3, jnp.float32),
                     flow=jnp.asarray(rng.uniform(size=(2, H, W)), jnp.float32)*W,
                     vis=jnp.ones((H, W), jnp.float32)),
    flow_valid=jnp.asarray(True))
opt_state = init_adam(TrainableState(gaussians=params, env=env))
k_nn = opt.near_num
a_cap = max(1, params.obj_capacity // k_nn)
idxg, validg = knn_lib.near_idx_device(
    params.obj_xyz, state.obj_alive, jax.random.PRNGKey(7), k_nn, a_cap)
jax.block_until_ready((idxg, validg))
state_reg = dc.replace(state, obj_near_idx=idxg, obj_near_valid=validg)
print("near ok", flush=True)
out = step(params, env, opt_state, state_reg, cam, batch, rays,
           jnp.float32(1000), active_sh_degree=3)
jax.block_until_ready(out)
print(f"ARM {ARM} in-step OK, loss", float(out[-1]["total_loss"]), flush=True)
