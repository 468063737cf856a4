"""Interleaved A/B sweep of the Pallas DMA chunk size (ADGS_PALLAS_CHUNK).

Hypothesis: the fwd/bwd kernels are bound by per-chunk loop latency (DMA
issue + scalar control ~1.5us/chunk), not HBM bandwidth — the whole live
instance set is only ~90MB/pass. Doubling CHUNK halves chunk count at the
cost of coarser window-covering waste (~+1872 x CHUNK/2 wasted columns).

Runs in ONE process (pays the axon tunnel once) and interleaves settings
ABAB to defeat shared-chip drift. bin_step is CHUNK-independent and built
once.
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

N_GAUSS = int(os.environ.get("BENCH_N_GAUSS", 1_000_000))
WIDTH, HEIGHT = 1242, 375
ITERS = int(os.environ.get("BENCH_ITERS", 20))
CHUNKS = [int(c) for c in
          os.environ.get("LAB_CHUNKS", "256,512,256,512").split(",")]

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
_head = float(os.environ.get("LAB_HEADROOM", "0.8"))
CAPACITY = -(-int(nr / _head) // 4096) * 4096
print(f"# capacity {CAPACITY} (num_rendered {nr})", file=sys.stderr)


@jax.jit
def bin_step(p):
    prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                               p["opacities"], None, settings)
    return binning_lib.bin_gaussians(prep, settings, capacity=CAPACITY,
                                     expander="auto")


def make_grad_step():
    def loss_fn(p, b):
        prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                                   p["opacities"], p["shs"], settings)
        out = pal.render_pallas(prep, b, settings)
        return (jnp.mean(jnp.abs(out.color - target))
                + 0.1 * jnp.mean(out.depth))
    return jax.jit(jax.value_and_grad(loss_fn))


b0 = jax.block_until_ready(bin_step(params))
steps = {}
results = {}
for c in CHUNKS:
    if c not in steps:
        assert CAPACITY % c == 0
        pal.CHUNK = c
        steps[c] = make_grad_step()
        t0 = time.perf_counter()
        jax.block_until_ready(steps[c](params, b0))
        print(f"# chunk {c}: warm/compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    # NOTE: pal.CHUNK binds at TRACE time only — the cached jitted steps
    # ignore the module constant at call time, so no re-set is needed here
    # (and re-setting it would silently cross-contaminate arms if anything
    # ever retraced mid-loop, e.g. on a shape change).
    step = steps[c]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        b = bin_step(params)
        out = step(params, b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    results.setdefault(c, []).append(ITERS / dt)
    print(f"chunk {c}: {ITERS/dt:.2f} it/s ({dt/ITERS*1e3:.1f} ms/it)")

for c, v in sorted(results.items()):
    print(f"chunk {c}: runs {['%.2f' % x for x in v]} it/s")
