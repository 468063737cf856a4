"""Quantify exact ellipse-tile intersection culling vs the AABB rect.

Every capacity-proportional stage (~44 ms of the 82 ms iteration) scales
with sum(tiles_touched). The AABB rect counts every cell of the support
ellipse's bounding box; the exact test keeps a cell only if the MINIMUM of
the Mahalanobis quadratic over the cell's pixel box clears the opacity-
aware gate q <= q_max. This lab measures the achievable instance-count
reduction at bench scale before we commit to building the packed-cell-list
plumbing (preprocess count + expansion enumeration must agree exactly).

Min of a PD quadratic q(d) = ca dx^2 + 2 cb dx dy + cc dy^2 over an
axis-aligned box: 0 if the center is inside, else the min over the four
edges, each a 1-D clamped quadratic minimization (exact, ~12 flops each).

Run: python exp/lab_cull.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
if os.environ.get("LAB_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from adgs_tpu.core.camera import Camera
from adgs_tpu.render import settings_for_camera
from adgs_tpu.raster import preprocess as prep_lib
from adgs_tpu.raster.types import TILE_X, TILE_Y

N_GAUSS = int(os.environ.get("BENCH_N_GAUSS", 1_000_000))
WIDTH, HEIGHT = 1242, 375
MAXC = 16      # cells enumerable by the packed 4-bit scheme

rng = np.random.default_rng(0)
pts = np.zeros((N_GAUSS, 3), dtype=np.float32)
pts[:, 2] = rng.uniform(2.0, 80.0, N_GAUSS)
fovx, fovy = 1.2, 0.42
pts[:, 0] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovx / 2) * 2
pts[:, 1] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovy / 2) * 2
scales = np.exp(rng.normal(size=(N_GAUSS, 3)) * 0.4 - 3.2) * pts[:, 2:3] * 0.05
quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
opac = rng.uniform(0.2, 0.9, N_GAUSS).astype(np.float32)

cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=fovx, fovy=fovy,
                    width=WIDTH, height=HEIGHT)
settings = settings_for_camera(cam, sh_degree=3)


@jax.jit
def counts(means3d, sc, qu, op):
    prep = prep_lib.preprocess(means3d, jnp.asarray(sc, jnp.float32),
                               qu, op, None, settings)
    n_aabb = prep.tiles_touched.astype(jnp.int64)
    w = (prep.rect_max[:, 0] - prep.rect_min[:, 0]).astype(jnp.float32)
    area = prep.tiles_touched
    fits = (area > 0) & (area <= MAXC)

    q_max = 2.0 * jnp.log(255.0 * jnp.maximum(op, 1e-30)) + 1e-3
    q_max = jnp.clip(q_max, 0.0, 9.0)
    ca, cb, cc = prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2]
    mx, my = prep.mean2d[:, 0], prep.mean2d[:, 1]

    def cell_min(i):
        # cell i (row-major in the rect): pixel box [bx0,bx1]x[by0,by1]
        fi = jnp.float32(i)
        cy = jnp.floor(fi / jnp.maximum(w, 1.0))
        cx = fi - cy * w
        tx = prep.rect_min[:, 0].astype(jnp.float32) + cx
        ty = prep.rect_min[:, 1].astype(jnp.float32) + cy
        bx0 = tx * TILE_X - mx
        bx1 = bx0 + (TILE_X - 1)
        by0 = ty * TILE_Y - my
        by1 = by0 + (TILE_Y - 1)
        inside = (bx0 <= 0) & (0 <= bx1) & (by0 <= 0) & (0 <= by1)

        def edge_y(dy):
            dx = jnp.clip(-cb * dy / jnp.maximum(ca, 1e-30), bx0, bx1)
            return ca * dx * dx + 2 * cb * dx * dy + cc * dy * dy

        def edge_x(dx):
            dy = jnp.clip(-cb * dx / jnp.maximum(cc, 1e-30), by0, by1)
            return ca * dx * dx + 2 * cb * dx * dy + cc * dy * dy

        qmin = jnp.minimum(jnp.minimum(edge_y(by0), edge_y(by1)),
                           jnp.minimum(edge_x(bx0), edge_x(bx1)))
        qmin = jnp.where(inside, 0.0, qmin)
        return (qmin <= q_max) & (i < area)

    surv = jnp.zeros_like(area)
    for i in range(MAXC):
        surv = surv + cell_min(i).astype(jnp.int32)
    n_exact = jnp.where(fits, surv, area).astype(jnp.int64)
    n_fit1 = jnp.sum(jnp.where(fits & (area == 1), 1, 0))
    return (jnp.sum(n_aabb), jnp.sum(n_exact), jnp.sum(fits),
            jnp.sum(area > 0), n_fit1)


a, e, nf, nv, n1 = counts(jnp.asarray(pts), scales, jnp.asarray(quats),
                          jnp.asarray(opac))
print(f"visible gaussians      {int(nv)}")
print(f"  fit (area<={MAXC})     {int(nf)}  (area==1: {int(n1)})")
print(f"AABB instances         {int(a)}")
print(f"exact instances        {int(e)}")
print(f"reduction              {1 - int(e)/int(a):.3%}")
