"""Env-map cost decomposition at PRODUCTION resolution (8192, the
reference's env_args) vs the bench scene's 512: fwd, full fwd+bwd, bwd
kernel alone, and the d_grid zeros+add overhead. ABAB in one process.

Run: python exp/lab_env8k.py
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

H, W = 375, 1242
K = 10
RTT = 0.0


def fetch(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.sum(leaves[0].ravel()[:2].astype(jnp.float32)))


def chain_time(name, fn, *args):
    out = fn(*args)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    _ = fetch(out)
    dt = (time.perf_counter() - t0 - RTT) / K * 1e3
    print(f"{name:55s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    global RTT
    print(f"backend: {jax.default_backend()}", flush=True)
    from adgs_tpu.models.env_map import EnvironmentMap, camera_rays
    from adgs_tpu.ops import grid_sample as gs

    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)

    rays = jnp.asarray(camera_rays(707.0, H, W), jnp.float32)
    # horizon-looking pose (KITTI-like): camera +z -> world +x, so the
    # image footprint sits on the equirect equator, NOT the pole — an
    # identity pose puts every block at the pole, where no [48,256]
    # window covers the taps and the WHOLE frame silently falls back to
    # the generic path (the round-4 81ms mystery).
    M = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    wv = jnp.asarray(np.block([[M.T, np.zeros((3, 1), np.float32)],
                               [np.zeros((1, 3), np.float32),
                                np.ones((1, 1), np.float32)]]))
    cot = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, H, W)).astype(np.float32))

    for res in (512, 8192):
        env = EnvironmentMap.create(res, seed=0)
        print(f"--- resolution {res}, grid {env.grid.shape} ---", flush=True)

        @jax.jit
        def fwd(e):
            return e.image_background(rays, wv)
        chain_time(f"[{res}] image_background fwd", fwd, env)

        @jax.jit
        def fwdbwd(e):
            return jax.grad(
                lambda ee: jnp.sum(ee.image_background(rays, wv) * cot))(e)
        chain_time(f"[{res}] image_background fwd+bwd", fwdbwd, env)

        # bwd kernel alone: precompute taps outside, time the pallas call
        from adgs_tpu.models.env_map import direction_to_angles
        wrays = jnp.matmul(rays, wv[:3, :3].T, precision="highest")
        view = wrays / jnp.maximum(
            jnp.linalg.norm(wrays, axis=-1, keepdims=True), 1e-12)
        coords = direction_to_angles(view) * jnp.asarray(
            [1.0 / jnp.pi, 2.0 / jnp.pi], jnp.float32)
        gshape = env.grid.shape
        nby, nbx = -(-H // gs.BH), -(-W // gs.BW)
        xi_b, yi_b, w_b, y0, x0, ok_b, ok = gs._tap_blocks(
            gshape, coords, H, W, nby, nbx)
        print(f"    fast path ok: {bool(ok)}  bad blocks: "
              f"{int(np.sum(~np.asarray(ok_b)))}", flush=True)
        g_b = jnp.asarray(
            np.random.default_rng(1).normal(
                size=(nby * nbx, 3, gs.P)).astype(np.float32))

        @jax.jit
        def bwd_kernel(gb):
            return gs.scatter_image_pallas(gb, gshape, xi_b, yi_b, w_b,
                                           y0, x0, nby, nbx)
        chain_time(f"[{res}] scatter_image_pallas alone", bwd_kernel, g_b)

        @jax.jit
        def fwd_kernel(e):
            return gs.sample_image_pallas(e.grid, xi_b, yi_b, w_b, y0, x0,
                                          nby, nbx, as_blocks=True)
        chain_time(f"[{res}] sample_image_pallas alone", fwd_kernel, env)

        @jax.jit
        def zeros_add(e):
            z = jnp.zeros(gshape, jnp.float32)
            return z + e.grid
        chain_time(f"[{res}] zeros + add (d_grid overhead)", zeros_add, env)


if __name__ == "__main__":
    main()
