"""Bisect: gaussian_term_losses grad STANDALONE at the repro shapes."""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import dataclasses as dc
import __graft_entry__ as ge
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train.losses import gaussian_term_losses
from adgs_tpu.ops import knn as knn_lib

N = 1_000_000
print("backend:", jax.default_backend(), flush=True)
params, state, cfg, cam, env, rays = ge._build_scene(
    n_points=N, width=1242, height=375, quantum=max(4096, N // 64))
print("xyz_deform", params.xyz_deform.shape, "sigma", params.gs_time_sigma.shape, flush=True)
opt = OptimizationConfig()
k_nn = opt.near_num
a_cap = max(1, params.obj_capacity // k_nn)
idxg, validg = knn_lib.near_idx_device(
    params.obj_xyz, state.obj_alive, jax.random.PRNGKey(7), k_nn, a_cap)
jax.block_until_ready((idxg, validg))
state_reg = dc.replace(state, obj_near_idx=idxg, obj_near_valid=validg)
print("near ok", flush=True)

@jax.jit
def f(p):
    total, logs = gaussian_term_losses(p, state_reg, opt, 1.0/60)
    return total
g = jax.jit(jax.value_and_grad(f))
l, gr = g(params)
jax.block_until_ready((l, gr))
print("standalone reg grad OK, loss", float(l), flush=True)
