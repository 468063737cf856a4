"""Coexistence bisect: reg MXU grad + binning expand + env sampler in ONE
jit (no raster kernels, no image losses). Arms build up the program."""
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
from adgs_tpu.ops import knn as knn_lib
from adgs_tpu.render import compute_binning

L.REG_MXU = 1
N = 1_000_000
print("backend:", jax.default_backend(), flush=True)
params, state, cfg, cam, env, rays = ge._build_scene(
    n_points=N, width=1242, height=375, quantum=max(4096, N // 64))
_shr = float(np.log(0.3))
params = dc.replace(params, scene_scaling=params.scene_scaling + _shr,
                    obj_scaling=params.obj_scaling + _shr)
opt = OptimizationConfig()
K = opt.near_num
a_cap = max(1, params.obj_capacity // K)
idxg, validg = knn_lib.near_idx_device(
    params.obj_xyz, state.obj_alive, jax.random.PRNGKey(7), K, a_cap)
jax.block_until_ready((idxg, validg))
state = dc.replace(state, obj_near_idx=idxg, obj_near_valid=validg)
print("near ok", flush=True)

def reg_loss(p):
    t, _ = L.gaussian_term_losses(p, state, opt, 1.0 / 60)
    return t

def run(tag, fn):
    try:
        out = jax.jit(fn)(params)
        jax.block_until_ready(out)
        print(f"{tag}: OK", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAULT {type(e).__name__}: {str(e)[:100]}", flush=True)
        return False

# arm 1: reg grad + env sampler fwd in one jit
def arm1(p):
    g = jax.grad(reg_loss)(p)
    bg = env.image_background(rays, cam.world_view)
    return jnp.sum(g.xyz_deform) + jnp.sum(bg)
ok1 = run("reg-grad + env-sampler        ", arm1)

# arm 2: reg grad + binning (pallas expand) in one jit
def arm2(p):
    g = jax.grad(reg_loss)(p)
    b = compute_binning(cam, p, state, cfg, active_sh_degree=3,
                        capacity=1409024)
    return jnp.sum(g.xyz_deform) + jnp.sum(b.tile_count)
ok2 = run("reg-grad + binning-expand     ", arm2)

# arm 3: all three
def arm3(p):
    g = jax.grad(reg_loss)(p)
    b = compute_binning(cam, p, state, cfg, active_sh_degree=3,
                        capacity=1409024)
    bg = env.image_background(rays, cam.world_view)
    return jnp.sum(g.xyz_deform) + jnp.sum(b.tile_count) + jnp.sum(bg)
ok3 = run("reg-grad + expand + env       ", arm3)
print("done", flush=True)
