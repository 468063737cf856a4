"""Interleaved A/B of the live-compaction tier (ADGS_COMPACT sort|kernel).

Train scenes (~50% dead gaussians) take the live-compacted expansion; its
cost is the compaction itself. Arms:
  sort   — u32 sort + row gather (round-3 form, ~5 ms at 1M)
  kernel — streaming Pallas compactor (counting pass + one sequential
           one-hot-placement kernel with 128-aligned group writes)
Both must produce BITWISE-identical binning outputs (checked compiled, on
chip). ABAB in one process; measures the staged bin_step.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adgs_tpu.core.camera import Camera
from adgs_tpu.render import settings_for_camera
from adgs_tpu.raster import preprocess as prep_lib
from adgs_tpu.raster import binning as binning_lib
from adgs_tpu.raster.pallas import expand as expand_lib

N_GAUSS = int(os.environ.get("BENCH_N_GAUSS", 1_000_000))
DEAD = float(os.environ.get("LAB_DEAD", 0.45))
WIDTH, HEIGHT = 1242, 375
ITERS = int(os.environ.get("BENCH_ITERS", 30))
ARMS = os.environ.get("LAB_ARMS", "sort,kernel,sort,kernel").split(",")

rng = np.random.default_rng(0)
pts = np.zeros((N_GAUSS, 3), dtype=np.float32)
pts[:, 2] = rng.uniform(2.0, 80.0, N_GAUSS)
fovx, fovy = 1.2, 0.42
pts[:, 0] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovx / 2) * 2
pts[:, 1] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovy / 2) * 2
# interleaved dead gaussians (culled behind the camera), train-scene style
pts[rng.random(N_GAUSS) < DEAD, 2] = -5.0
scales = np.exp(rng.normal(size=(N_GAUSS, 3)) * 0.4 - 3.2) * np.abs(pts[:, 2:3]) * 0.05
quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
opac = rng.uniform(0.2, 0.9, N_GAUSS).astype(np.float32)

cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=fovx, fovy=fovy,
                    width=WIDTH, height=HEIGHT)
settings = settings_for_camera(cam, sh_degree=3)
params = dict(means3d=jnp.asarray(pts),
              scales=jnp.asarray(scales, dtype=jnp.float32),
              rotations=jnp.asarray(quats), opacities=jnp.asarray(opac))


@jax.jit
def _probe(p):
    prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                               p["opacities"], None, settings)
    off = binning_lib.cumsum_mxu(prep.tiles_touched)
    ok = expand_lib.window_starts(off, off - prep.tiles_touched,
                                  1 << 20)[1]
    return jnp.sum(prep.tiles_touched), ok


nr, win_ok = _probe(params)
nr = int(nr)
CAPACITY = -(-int(nr / 0.8) // 4096) * 4096
print(f"# capacity {CAPACITY} (num_rendered {nr}), direct window_ok="
      f"{bool(win_ok)} (must be False for this lab)", file=sys.stderr)


def make_bin_step():
    def f(p):
        prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                                   p["opacities"], None, settings)
        return binning_lib.bin_gaussians(prep, settings, capacity=CAPACITY,
                                         expander="auto")
    return jax.jit(f)


steps = {}
ref = None
results = {}
for arm in ARMS:
    if arm not in steps:
        expand_lib.COMPACT = arm
        steps[arm] = make_bin_step()
        t0 = time.perf_counter()
        b = jax.block_until_ready(steps[arm](params))
        print(f"# {arm}: warm/compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        chk = (np.asarray(b.gauss_id), np.asarray(b.tile_start),
               np.asarray(b.tile_count), np.asarray(b.slot_sorted))
        if ref is None:
            ref = chk
        else:
            for a, r in zip(chk, ref):
                np.testing.assert_array_equal(a, r)
            print(f"# {arm}: binning outputs bitwise-equal to first arm",
                  file=sys.stderr)
    step = steps[arm]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        b = step(params)
    jax.block_until_ready(b)
    dt = time.perf_counter() - t0
    results.setdefault(arm, []).append(ITERS / dt)
    print(f"{arm}: {ITERS/dt:.2f} it/s ({dt/ITERS*1e3:.2f} ms/it)")

for arm, v in results.items():
    print(f"{arm}: runs {['%.2f' % x for x in v]} it/s")
