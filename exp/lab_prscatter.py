"""Hybrid grad-layout A/B/C on-chip, ABAB-interleaved in ONE process:

  A (base):    CM instances, CM grads, sort+narrow-gather permute
  B (rmgrad):  CM instances, RM grads,  sort+WIDE-gather permute
  C (scatter): CM instances, RM grads,  row-SCATTER permute (no sort)

Flips pal.RM_GRAD / pal.PR_SCATTER and re-jits per arm (lab_rm pattern).

Run: python exp/lab_prscatter.py
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

N_GAUSS = int(os.environ.get("LAB_N_GAUSS", 1_000_000))
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
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from lab_stages import make_inputs
    params, target, settings = make_inputs()
    from adgs_tpu.raster import preprocess as prep_lib
    from adgs_tpu.raster import binning as binning_lib
    from adgs_tpu.raster.pallas import render as pal

    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)

    @jax.jit
    def probe(p):
        prep = prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            None, settings)
        return jnp.sum(prep.tiles_touched)
    nr = int(probe(params))
    CAP = -(-int(nr / 0.8) // 4096) * 4096
    print(f"num_rendered {nr} capacity {CAP}", flush=True)

    @jax.jit
    def bin_step(p):
        prep = prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            None, settings)
        return binning_lib.bin_gaussians(prep, settings, capacity=CAP,
                                         expander="auto")
    b = bin_step(params)

    ARMS = {"A:base": (0, 0), "B:rmgrad": (1, 0), "C:scatter": (1, 1)}

    def make_arm(rm_grad, pr_scatter):
        pal.RM, pal.RM_GRAD, pal.PR_SCATTER = 0, rm_grad, pr_scatter

        def loss_fn(p, bb):
            prep = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], settings)
            out = pal.render_pallas(prep, bb, settings)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))
        return jax.jit(jax.value_and_grad(loss_fn))

    arms, vals = {}, {}
    for name, (rg, ps) in ARMS.items():
        step = make_arm(rg, ps)
        loss, grads = step(params, b)
        arms[name] = step
        vals[name] = (float(loss), grads)
        print(f"arm {name} compiled, loss={float(loss):.6f}", flush=True)

    l0, g0 = vals["A:base"]
    for name in ("B:rmgrad", "C:scatter"):
        l, g = vals[name]
        gm0 = np.asarray(g0["means3d"])
        gm = np.asarray(g["means3d"])
        rel = np.abs(gm0 - gm).max() / max(np.abs(gm0).max(), 1e-12)
        print(f"{name}: |dloss| = {abs(l - l0):.3e}  "
              f"max|dgrad|rel = {rel:.3e}", flush=True)

    acc = {n: [] for n in ARMS}
    for rnd in range(3):
        for name in ARMS:
            # re-set flags: jitted fns are already compiled per arm, but
            # the flags only matter at trace time — safe either way
            pal.RM_GRAD, pal.PR_SCATTER = ARMS[name]
            acc[name].append(chain_time(arms[name], params, b))
        print(f"round {rnd}: " + "  ".join(
            f"{n}={acc[n][-1]:.2f}" for n in ARMS), flush=True)

    print("\nstep medians (ms):", flush=True)
    base = sorted(acc["A:base"])[1]
    for n in ARMS:
        m = sorted(acc[n])[1]
        print(f"  {n:10s} {m:8.2f}   delta {m - base:+7.2f}", flush=True)


if __name__ == "__main__":
    main()
