"""ABAB in ONE process: packed-trainables shard_map boundary ON vs OFF.

Cross-process CPU readings on this host swing +-20%; the pack env var is
read at step-BUILD time, so both variants build in one interpreter and
interleave. Run: python exp/lab_pack.py [D] [rounds]
"""
import os
import sys
import time

D = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
ITERS = 4

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={D}")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from adgs_tpu.parallel.shard import make_sharded_train_step
from adgs_tpu.train.config import OptimizationConfig
from adgs_tpu.train.losses import FrameBatch
from adgs_tpu.train.optim import TrainableState, init_adam
import __graft_entry__ as ge

H, W = 128, 256
params, state, cfg, cam, env, rays = ge._build_scene(
    n_points=50_000, width=W, height=H, quantum=4096)
from adgs_tpu.models.env_map import EnvironmentMap
env = EnvironmentMap.create(resolution=256)
opt = OptimizationConfig(lambda_flow=0.0, lambda_obj=0.0,
                         lambda_reg=0.0, lambda_sigma_reg=0.0)
batch = FrameBatch(image=jnp.zeros((3, H, W), jnp.float32),
                   depth=jnp.ones((H, W), jnp.float32),
                   sky=jnp.zeros((H, W), jnp.float32),
                   semantic=jnp.zeros((H, W), jnp.float32))
mesh = Mesh(np.asarray(jax.devices()[:D]), ("tile",))

def build(pack: int, cap: int):
    os.environ["ADGS_PACK_GRADS"] = str(pack)
    return make_sharded_train_step(
        cfg, opt, frame_gap=1 / 60, scene_extent=20.0,
        cameras_extent=10.0, mesh=mesh, capacity=cap,
        max_per_tile=1024, primitive_exchange=True)

opt_state = init_adam(TrainableState(gaussians=params, env=env))
probe = build(1, 1 << 16)
out = probe(params, env, opt_state, state, cam, batch, rays,
            jnp.float32(1), active_sh_degree=1)
jax.block_until_ready(out)
nr = int(out[-1]["num_rendered"])
cap = max(4096, -(-int(nr / 0.8) // 4096) * 4096)
print(f"D={D} nr={nr} cap={cap}")

steps = {"pack": build(1, cap), "tree": build(0, cap)}
losses = {}
for name, stp in steps.items():
    out = stp(params, env, opt_state, state, cam, batch, rays,
              jnp.float32(1), active_sh_degree=1)
    jax.block_until_ready(out)
    losses[name] = float(out[-1]["total_loss"])
print("loss pack", losses["pack"], "tree", losses["tree"],
      "equal" if losses["pack"] == losses["tree"] else "DIFFER")

res = {"pack": [], "tree": []}
util = {"pack": [], "tree": []}
for r in range(ROUNDS):
    for name in (("pack", "tree") if r % 2 == 0 else ("tree", "pack")):
        stp = steps[name]
        t0 = time.perf_counter()
        c0 = time.process_time()
        for _ in range(ITERS):
            out = stp(params, env, opt_state, state, cam, batch, rays,
                      jnp.float32(1), active_sh_degree=1)
        jax.block_until_ready(out)
        wall = time.perf_counter() - t0
        util[name].append((time.process_time() - c0) / wall)
        res[name].append(wall / ITERS * 1e3)
for name, v in res.items():
    print(f"{name}: median {np.median(v):.1f} ms  "
          f"cores-used {np.median(util[name]):.2f}  runs "
          + " ".join(f"{x:.1f}" for x in v))
