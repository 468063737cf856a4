"""Content bisect: which idx content faults the REG_MXU backward?
Arms (one process): uniform idx / near idx / near idx with spread padding;
each for xyz-reg only, then sigma-reg only."""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import dataclasses as dc
import __graft_entry__ as ge
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train import losses
from adgs_tpu.ops import knn as knn_lib

N = 1_000_000
print("backend:", jax.default_backend(), flush=True)
params, state, cfg, cam, env, rays = ge._build_scene(
    n_points=N, width=1242, height=375, quantum=max(4096, N // 64))
No = params.obj_capacity
opt = OptimizationConfig()
K = opt.near_num
a_cap = max(1, No // K)
rng = np.random.default_rng(0)
idx_u = jnp.asarray(rng.integers(0, No, (a_cap, K)), jnp.int32)
valid_all = jnp.ones((a_cap,), bool)
idxg, validg = knn_lib.near_idx_device(
    params.obj_xyz, state.obj_alive, jax.random.PRNGKey(7), K, a_cap)
jax.block_until_ready((idxg, validg))
spread = (jnp.arange(a_cap, dtype=jnp.int32)[:, None] * K
          + jnp.arange(K, dtype=jnp.int32)) % No
idx_s = jnp.where(validg[:, None], idxg, spread)
print("near ok; invalid anchors:", int(jnp.sum(~validg)), flush=True)

def run(tag, vals, idx, valid):
    try:
        g = jax.jit(jax.grad(lambda v: losses._group_variance_loss(
            v, idx, valid)))(vals)
        jax.block_until_ready(g)
        print(f"{tag}: OK", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAULT {type(e).__name__}: {str(e)[:120]}", flush=True)
        return False

run("xyz + uniform idx       ", params.xyz_deform, idx_u, valid_all)
run("sigma + uniform idx     ", params.gs_time_sigma, idx_u, valid_all)
run("xyz + near idx          ", params.xyz_deform, idxg, validg)
run("sigma + near idx        ", params.gs_time_sigma, idxg, validg)
run("xyz + near idx spread   ", params.xyz_deform, idx_s, validg)
