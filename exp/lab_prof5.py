"""On-chip xplane op profile of the bench-protocol raster step (round 5).

Builds the same staged bin_step + grad_step as bench.py's pallas path at
1M/KITTI scale, traces a few steady-state iterations, and prints the top
TPU ops by total duration. Run: python exp/lab_prof5.py
"""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from adgs_tpu.core.camera import Camera
from adgs_tpu.render import settings_for_camera
from adgs_tpu.raster import preprocess as prep_lib
from adgs_tpu.raster import binning as binning_lib
from adgs_tpu.raster.pallas import render as pal

N, W, H = 1_000_000, 1242, 375
rng = np.random.default_rng(0)
pts = np.zeros((N, 3), dtype=np.float32)
pts[:, 2] = rng.uniform(2.0, 80.0, N)
fovx, fovy = 1.2, 0.42
pts[:, 0] = rng.uniform(-0.75, 0.75, N) * pts[:, 2] * np.tan(fovx / 2) * 2
pts[:, 1] = rng.uniform(-0.75, 0.75, N) * pts[:, 2] * np.tan(fovy / 2) * 2
shs = np.zeros((N, 16, 3), dtype=np.float32)
shs[:, 0] = rng.uniform(-1, 1, (N, 3))
shs[:, 1:] = rng.normal(size=(N, 15, 3)) * 0.05
scales = np.exp(rng.normal(size=(N, 3)) * 0.4 - 3.2) * pts[:, 2:3] * 0.05
quats = rng.normal(size=(N, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=fovx, fovy=fovy,
                    width=W, height=H)
settings = settings_for_camera(cam, sh_degree=3)
params = dict(means3d=jnp.asarray(pts), shs=jnp.asarray(shs),
              scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
              opacities=jnp.asarray(opac))
target = jnp.asarray(rng.uniform(size=(3, H, W)), dtype=jnp.float32)


@jax.jit
def _probe(p):
    prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                               p["opacities"], None, settings)
    return jnp.sum(prep.tiles_touched)


nr = int(_probe(params))
CAP = -(-int(nr / 0.92) // 4096) * 4096
print(f"nr={nr} cap={CAP}")


@jax.jit
def bin_step(p):
    prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                               p["opacities"], None, settings)
    return binning_lib.bin_gaussians(prep, settings, capacity=CAP,
                                     expander="auto")


def loss_fn(p, b):
    prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                               p["opacities"], p["shs"], settings)
    out = pal.render_pallas(prep, b, settings)
    return (jnp.mean(jnp.abs(out.color - target))
            + 0.1 * jnp.mean(out.depth))


grad_step = jax.jit(jax.value_and_grad(loss_fn))


def step(p):
    b = bin_step(p)
    return grad_step(p, b)


loss, grads = step(params)
jax.block_until_ready((loss, grads))
t0 = time.perf_counter()
for _ in range(10):
    loss, grads = step(params)
jax.block_until_ready((loss, grads))
dt = (time.perf_counter() - t0) / 10
print(f"step {dt*1e3:.2f} ms ({1/dt:.2f} it/s)")

tdir = "/tmp/prof5"
with jax.profiler.trace(tdir):
    for _ in range(3):
        loss, grads = step(params)
    jax.block_until_ready((loss, grads))

import glob
pb = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))[-1]
pd = jax.profiler.ProfileData.from_file(pb)
tot, cnt = defaultdict(float), defaultdict(int)
for plane in pd.planes:
    is_dev = "TPU" in plane.name or "/device" in plane.name.lower()
    for line in plane.lines:
        for ev in line.events:
            key = (plane.name.split()[0][:14], ev.name)
            tot[key] += ev.duration_ns / 1e6
            cnt[key] += 1
rows = sorted(tot.items(), key=lambda kv: -kv[1])[:55]
print(f"{'plane':14s} {'op':56s} {'ms_tot':>8s} {'n':>6s}")
for (pl_, name), ms in rows:
    print(f"{pl_:14s} {name[:56]:56s} {ms:8.1f} {cnt[(pl_, name)]:6d}")
