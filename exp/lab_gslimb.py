"""Env-map tap-dot limb-split A/B on-chip (GS_LIMB: 3 DEFAULT passes vs
HIGHEST's 6 on the window matmuls), ABAB in ONE process, fwd+bwd at the
production 8192 grid with a horizon pose.

Run: python exp/lab_gslimb.py
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
RES = 8192
K = 10
RTT = 0.0


def fetch(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.sum(leaves[0].ravel()[:2].astype(jnp.float32)))


def chain_time(fn, *args):
    out = fn(*args)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    _ = fetch(out)
    return (time.perf_counter() - t0 - RTT) / K * 1e3


def main():
    global RTT
    print(f"backend: {jax.default_backend()}", flush=True)
    from adgs_tpu.models.env_map import EnvironmentMap
    from adgs_tpu.models.env_map import camera_rays
    from adgs_tpu.ops import grid_sample as gs

    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)

    env = EnvironmentMap.create(RES, seed=0)
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

    def make_arm(limb):
        gs.GS_LIMB = limb

        def loss(e):
            bg = e.image_background(rays, wv)
            return jnp.sum(bg * cot)
        return jax.jit(jax.value_and_grad(loss))

    arms = {}
    grads = {}
    for name, ac in (("highest", False), ("limb", True)):
        f = make_arm(ac)
        l, g = f(env)
        arms[name] = f
        grads[name] = g
        print(f"arm {name} compiled, loss={float(l):.6f}", flush=True)

    g0 = np.asarray(grads["highest"].grid)
    g1 = np.asarray(grads["limb"].grid)
    rel = np.abs(g0 - g1).max() / max(np.abs(g0).max(), 1e-12)
    print(f"max|dgrad|rel = {rel:.3e}", flush=True)

    acc = {n: [] for n in arms}
    for rnd in range(3):
        for name, f in arms.items():
            acc[name].append(chain_time(f, env))
        print(f"round {rnd}: " + "  ".join(
            f"{n}={acc[n][-1]:.2f}" for n in arms), flush=True)

    print("\nfwd+bwd medians (ms):", flush=True)
    for n in arms:
        m = sorted(acc[n])[1]
        print(f"  {n:5s} {m:8.2f}", flush=True)


if __name__ == "__main__":
    main()
