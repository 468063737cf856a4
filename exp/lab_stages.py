"""Perf lab: stage-by-stage timings of the bench workload on the real TPU.

Run: python exp/lab_stages.py [stage...]
Stages: micro bin prep build fwd full seg
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

N_GAUSS = 1_000_000
WIDTH, HEIGHT = 1242, 375
CAPACITY = 2_000_000


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return out


def make_inputs():
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

    from adgs_tpu.core.camera import Camera
    from adgs_tpu.render import settings_for_camera
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=fovx, fovy=fovy,
                        width=WIDTH, height=HEIGHT)
    settings = settings_for_camera(cam, sh_degree=3)
    params = dict(
        means3d=jnp.asarray(pts), shs=jnp.asarray(shs),
        scales=jnp.asarray(scales, dtype=jnp.float32),
        rotations=jnp.asarray(quats), opacities=jnp.asarray(opac))
    target = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)), dtype=jnp.float32)
    return params, target, settings


def main():
    stages = set(sys.argv[1:]) or {"bin", "prep", "build", "fwd", "full", "seg", "micro"}
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    params, target, settings = make_inputs()
    from adgs_tpu.raster import preprocess as prep_lib
    from adgs_tpu.raster import binning as binning_lib
    from adgs_tpu.raster.pallas import render as pal

    @jax.jit
    def bin_step(p):
        prep = prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            p["shs"], settings)
        return binning_lib.bin_gaussians(prep, settings, capacity=CAPACITY)

    b = bin_step(params)
    jax.block_until_ready(b)

    if "bin" in stages:
        timeit("bin_step (prep+expand+sort+ranges)", bin_step, params)

        @jax.jit
        def bin_nosort(p):
            prep = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], settings)
            # expansion only: reuse internals by calling bin and dropping sort?
            # approximate: recompute expansion pieces
            tiles = prep.tiles_touched
            offsets = jnp.cumsum(tiles)
            starts = offsets - tiles
            bump = jnp.zeros(CAPACITY, jnp.int32).at[starts].add(
                jnp.ones_like(starts, jnp.int32), mode="drop")
            gid = jnp.cumsum(bump) - 1
            return gid, offsets[-1]
        timeit("  prep+expansion only (no sort)", bin_nosort, params)

    if "prep" in stages:
        @jax.jit
        def prep_only(p):
            return prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], settings)
        timeit("preprocess fwd", prep_only, params)

        @jax.jit
        def prep_nosh(p):
            return prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                None, settings)
        timeit("preprocess fwd (no SH)", prep_nosh, params)

        def prep_loss(p):
            pr = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], settings)
            return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.rgb)
                    + jnp.sum(pr.depth) + jnp.sum(pr.opacity))
        prep_grad = jax.jit(jax.grad(prep_loss))
        timeit("preprocess fwd+bwd (grad)", prep_grad, params)

    prep = jax.jit(lambda p: prep_lib.preprocess(
        p["means3d"], p["scales"], p["rotations"], p["opacities"],
        p["shs"], settings))(params)

    if "build" in stages:
        @jax.jit
        def build(pr, bb):
            from adgs_tpu.raster import composite as cmod
            feats = [pr.rgb, cmod.depth_feature(pr.depth, settings.inv_depth)[:, None]]
            features = jnp.concatenate(feats, axis=-1)
            opac2 = jnp.where(pr.visible, pr.opacity, 0.0)
            log_op = jnp.log(jnp.maximum(opac2, pal.OP_FLOOR))
            packed, F = pal.pack_gaussian_rows(pr.mean2d, pr.conic, log_op, features)
            return pal.build_instances(bb.gauss_id, packed, F)
        timeit("build_instances", build, prep, b)

    if "fwd" in stages:
        @jax.jit
        def fwd(pr, bb):
            out = pal.render_pallas(pr, bb, settings)
            return out.color
        timeit("render_pallas fwd (build+kernel+img)", fwd, prep, b)

    if "full" in stages:
        def loss_fn(p, bb):
            pr = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], settings)
            out = pal.render_pallas(pr, bb, settings)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))
        grad_step = jax.jit(jax.value_and_grad(loss_fn))
        timeit("full loss fwd+bwd", grad_step, params, b)

    if "seg" in stages:
        g_rows = 16
        R = b.gauss_id.shape[0]
        R_seg = -(-R // pal.SEG_C) * pal.SEG_C + pal.SEG_C
        key = jax.random.PRNGKey(0)
        cols = jax.random.normal(key, (g_rows, R_seg), jnp.float32)
        segf = jax.jit(lambda c, gs, nr: pal.segment_reduce_contiguous(
            c, gs, nr, N_GAUSS))
        timeit("segment_reduce_contiguous", segf, cols, b.gauss_start,
               b.num_rendered)

        @jax.jit
        def permute(grad_cm, slot_sorted):
            r_s = jnp.arange(R, dtype=jnp.int32)
            inv = jnp.full((R_seg,), R, jnp.int32).at[slot_sorted].set(
                r_s, mode="drop")
            inv = jax.lax.optimization_barrier(inv)
            grad_rm = jax.lax.optimization_barrier(grad_cm).T
            gm_rows = jax.lax.optimization_barrier(
                jax.lax.optimization_barrier(grad_rm)[inv])
            return jax.lax.optimization_barrier(gm_rows).T
        grad_cm = jax.random.normal(key, (g_rows, R + pal.CHUNK), jnp.float32)
        timeit("bwd grad permute (scatter+T+gather+T)", permute, grad_cm,
               b.slot_sorted)

    if "micro" in stages:
        key = jax.random.PRNGKey(0)
        R = 2_300_000
        rowsM = jax.random.normal(key, (R, 16), jnp.float32)
        rowsF = jax.random.normal(key, (16, R), jnp.float32)
        idx = jax.random.randint(key, (R,), 0, R, jnp.int32)
        vals = jax.random.normal(key, (R,), jnp.float32)

        timeit("micro: row gather [R,16][idx]",
               jax.jit(lambda m, i: jax.lax.optimization_barrier(m)[
                   jax.lax.optimization_barrier(i)]), rowsM, idx)
        timeit("micro: 1D gather [R][idx]",
               jax.jit(lambda v, i: jax.lax.optimization_barrier(v)[
                   jax.lax.optimization_barrier(i)]), vals, idx)
        timeit("micro: transpose [R,16]->[16,R]",
               jax.jit(lambda m: jax.lax.optimization_barrier(m).T + 0.0), rowsM)
        timeit("micro: 1D scatter-set int32",
               jax.jit(lambda i: jnp.zeros(R, jnp.int32).at[
                   jax.lax.optimization_barrier(i)].set(
                       jnp.arange(R, dtype=jnp.int32), mode="drop")), idx)
        timeit("micro: row scatter-set [R,16]",
               jax.jit(lambda m, i: jnp.zeros((R, 16), jnp.float32).at[
                   jax.lax.optimization_barrier(i)].set(
                       jax.lax.optimization_barrier(m), mode="drop")), rowsM, idx)
        timeit("micro: argsort [R] int32",
               jax.jit(lambda i: jnp.argsort(i)), idx)
        k1 = jax.random.randint(key, (R,), 0, 1092, jnp.int32)
        k2 = jax.random.normal(key, (R,), jnp.float32)
        timeit("micro: 2-key sort 3-payload",
               jax.jit(lambda a, c, g: jax.lax.sort(
                   (a, c, g, g), num_keys=2, is_stable=True)), k1, k2, idx)
        packed_key = (k1.astype(jnp.uint32) << 21) | jax.random.randint(
            key, (R,), 0, 1 << 21, jnp.int32).astype(jnp.uint32)
        timeit("micro: 1-key u32 sort 1-payload",
               jax.jit(lambda a, g: jax.lax.sort(
                   (a, g), num_keys=1, is_stable=True)),
               packed_key.astype(jnp.int32), idx)
        timeit("micro: cumsum f32 [R]",
               jax.jit(lambda v: jnp.cumsum(jax.lax.optimization_barrier(v))), vals)
        timeit("micro: cumsum rows [R,16] axis0",
               jax.jit(lambda m: jnp.cumsum(
                   jax.lax.optimization_barrier(m), axis=0)), rowsM)


if __name__ == "__main__":
    main()
