"""Interleaved A/B of limb-split cheap precision (LIMB) on the kernel dots
with an exactly-bf16 operand: the pixel-basis powers/moment matmuls, the
segment-reduce one-hot, and the expansion gather-as-matmul — 3 single-pass
DEFAULT dots instead of HIGHEST's 6 passes, equal-or-better accuracy
(bitwise for the integer expansion).

Methodology: ONE process, ABAB interleave, fresh jit per arm (LIMB binds
at trace time in BOTH render.py and expand.py).

Run: python exp/lab_limb.py
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
from adgs_tpu.raster.pallas import render as pal
from adgs_tpu.raster.pallas import expand as expand_lib

N_GAUSS = int(os.environ.get("BENCH_N_GAUSS", 1_000_000))
WIDTH, HEIGHT = 1242, 375
ITERS = int(os.environ.get("BENCH_ITERS", 20))
# arm token "L" or "L:F" — LIMB flag, optional FLOAT3 flag
ARMS = os.environ.get("LAB_LIMB", "0,1,0,1,0,1").split(",")

rng = np.random.default_rng(0)
pts = np.zeros((N_GAUSS, 3), dtype=np.float32)
pts[:, 2] = rng.uniform(2.0, 80.0, N_GAUSS)
fovx, fovy = 1.2, 0.42
pts[:, 0] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovx / 2) * 2
pts[:, 1] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovy / 2) * 2
K = 16
shs = np.zeros((N_GAUSS, K, 3), dtype=np.float32)
shs[:, 0] = rng.uniform(-1, 1, (N_GAUSS, 3))
shs[:, 1:] = rng.normal(size=(N_GAUSS, K - 1, 3)) * 0.05
scales = np.exp(rng.normal(size=(N_GAUSS, 3)) * 0.4 - 3.2) * pts[:, 2:3] * 0.05
quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
opac = rng.uniform(0.2, 0.9, N_GAUSS).astype(np.float32)

cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=fovx, fovy=fovy,
                    width=WIDTH, height=HEIGHT)
settings = settings_for_camera(cam, sh_degree=3)
params = dict(means3d=jnp.asarray(pts), shs=jnp.asarray(shs),
              scales=jnp.asarray(scales, dtype=jnp.float32),
              rotations=jnp.asarray(quats), opacities=jnp.asarray(opac))
target = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)), dtype=jnp.float32)


@jax.jit
def _probe(p):
    prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                               p["opacities"], None, settings)
    return jnp.sum(prep.tiles_touched)


nr = int(_probe(params))
CAPACITY = -(-int(nr / 0.8) // 4096) * 4096
print(f"# capacity {CAPACITY} (num_rendered {nr})", file=sys.stderr)


def make_bin_step():
    @jax.jit
    def bin_step(p):
        prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                                   p["opacities"], None, settings)
        return binning_lib.bin_gaussians(prep, settings, capacity=CAPACITY,
                                         expander="auto")
    return bin_step


def make_grad_step():
    def loss_fn(p, b):
        prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                                   p["opacities"], p["shs"], settings)
        out = pal.render_pallas(prep, b, settings)
        return (jnp.mean(jnp.abs(out.color - target))
                + 0.1 * jnp.mean(out.depth))
    return jax.jit(jax.value_and_grad(loss_fn))


steps = {}
results = {}
ref_loss = None
ref_g0 = None
for s in ARMS:
    if s not in steps:
        # LIMB/FLOAT3 bind at TRACE time in both modules
        parts = s.split(":")
        pal.LIMB = expand_lib.LIMB = int(parts[0])
        pal.FLOAT3 = int(parts[1]) if len(parts) > 1 else 0
        steps[s] = (make_bin_step(), make_grad_step())
        t0 = time.perf_counter()
        b0 = steps[s][0](params)
        out = jax.block_until_ready(steps[s][1](params, b0))
        g0 = float(jnp.linalg.norm(out[1]["means3d"]))
        print(f"# limb {s}: warm/compile {time.perf_counter()-t0:.1f}s "
              f"loss {float(out[0]):.6f} |g_xyz| {g0:.6e}", file=sys.stderr)
        if ref_loss is None:
            ref_loss, ref_g0 = float(out[0]), g0
        else:
            d = abs(float(out[0]) - ref_loss)
            dg = abs(g0 - ref_g0) / max(ref_g0, 1e-30)
            assert d < 1e-4, f"arm {s} loss diverges: {d}"
            assert dg < 1e-3, f"arm {s} grad diverges: {dg}"
            print(f"# arm {s}: |dloss| {d:.3e} |dgrad|rel {dg:.3e}",
                  file=sys.stderr)
    bin_step, step = steps[s]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        b = bin_step(params)
        out = step(params, b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    results.setdefault(s, []).append(ITERS / dt)
    print(f"limb {s}: {ITERS/dt:.2f} it/s ({dt/ITERS*1e3:.1f} ms/it)",
          flush=True)

for s, v in sorted(results.items()):
    print(f"limb {s}: runs {['%.2f' % x for x in v]} it/s")
