"""Where does the 8-virtual-device CPU slab step spend its time?

Traces a few steps of the sharded train step at D=8 (and optionally D=1)
on the forced-CPU mesh and aggregates xplane event durations by op name —
the per-op evidence for the structural-scaling work (VERDICT r4 #5).

Run: python exp/lab_scale8.py [D] [n_gauss]
"""
import os
import sys
import time
from collections import defaultdict

D = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NG = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

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
    n_points=NG, width=W, height=H, quantum=4096)
from adgs_tpu.models.env_map import EnvironmentMap
env = EnvironmentMap.create(resolution=256)
opt = OptimizationConfig(lambda_flow=0.0, lambda_obj=0.0,
                         lambda_reg=0.0, lambda_sigma_reg=0.0)
batch = FrameBatch(image=jnp.zeros((3, H, W), jnp.float32),
                   depth=jnp.ones((H, W), jnp.float32),
                   sky=jnp.zeros((H, W), jnp.float32),
                   semantic=jnp.zeros((H, W), jnp.float32))

mesh = Mesh(np.asarray(jax.devices()[:D]), ("tile",))
step = make_sharded_train_step(
    cfg, opt, frame_gap=1 / 60, scene_extent=20.0, cameras_extent=10.0,
    mesh=mesh, capacity=1 << 16, max_per_tile=1024,
    primitive_exchange=True)
opt_state = init_adam(TrainableState(gaussians=params, env=env))
out = step(params, env, opt_state, state, cam, batch, rays,
           jnp.float32(1), active_sh_degree=1)
jax.block_until_ready(out)
nr = int(out[-1]["num_rendered"])
cap = max(4096, -(-int(nr / 0.8) // 4096) * 4096)
if cap < (1 << 16):
    step = make_sharded_train_step(
        cfg, opt, frame_gap=1 / 60, scene_extent=20.0,
        cameras_extent=10.0, mesh=mesh, capacity=cap,
        max_per_tile=1024, primitive_exchange=True)
    out = step(params, env, opt_state, state, cam, batch, rays,
               jnp.float32(1), active_sh_degree=1)
    jax.block_until_ready(out)
print(f"D={D} nr={nr} cap={cap}")

ITERS = 6
t0 = time.perf_counter()
for _ in range(ITERS):
    out = step(params, env, opt_state, state, cam, batch, rays,
               jnp.float32(1), active_sh_degree=1)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / ITERS
print(f"step {dt*1e3:.1f} ms  ({H*W/dt:.0f} pix/s)")

tdir = f"/tmp/scale8_trace_d{D}"
with jax.profiler.trace(tdir):
    for _ in range(3):
        out = step(params, env, opt_state, state, cam, batch, rays,
                   jnp.float32(1), active_sh_degree=1)
    jax.block_until_ready(out)

# find the xplane file
import glob
pb = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))[-1]
pd = jax.profiler.ProfileData.from_file(pb)
tot = defaultdict(float)
cnt = defaultdict(int)
for plane in pd.planes:
    for line in plane.lines:
        for ev in line.events:
            tot[ev.name] += ev.duration_ns / 1e6
            cnt[ev.name] += 1
rows = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
print(f"{'op':60s} {'ms_total':>9s} {'n':>6s}")
for name, ms in rows:
    print(f"{name[:60]:60s} {ms:9.1f} {cnt[name]:6d}")
