"""bf16x3 float-dot tier A/B (FLOAT3: fg, feature accum, d_feat dots as
3 single-pass bf16 matmuls instead of HIGHEST's 6), ABAB in ONE process,
on the isolated fwd/bwd kernels and the end-to-end step. Numerics drift
expected ~2^-21 relative — printed for the quality call.

Run: python exp/lab_f3.py
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
    from adgs_tpu.raster import composite as cmod
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

    def make_arm(f3):
        pal.FLOAT3 = f3

        def loss_fn(p, bb):
            prep = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], settings)
            out = pal.render_pallas(prep, bb, settings)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))
        step = jax.jit(jax.value_and_grad(loss_fn))

        @jax.jit
        def build(pr, bb):
            feats = [pr.rgb,
                     cmod.depth_feature(pr.depth,
                                        settings.inv_depth)[:, None]]
            features = jnp.concatenate(feats, axis=-1)
            opac2 = jnp.where(pr.visible, pr.opacity, 0.0)
            log_op = jnp.log(jnp.maximum(opac2, pal.OP_FLOOR))
            packed, F = pal.pack_gaussian_rows(pr.mean2d, pr.conic, log_op,
                                               features)
            return pal.build_instances(bb.gauss_id, packed, F)

        @jax.jit
        def fwd_kernel(i, bb):
            return pal._fwd_call(i, 16, bb.tile_start, bb.tile_count,
                                 settings.num_tiles, settings.grid_x, 4)

        @jax.jit
        def bwd_kernel(i, bb, g, o):
            return pal._bwd_call(i, 16, bb.tile_start, bb.tile_count, g, o,
                                 settings.num_tiles, settings.grid_x, 4,
                                 i.shape[1])
        return dict(step=step, build=build, fwd=fwd_kernel, bwd=bwd_kernel)

    prep = jax.jit(lambda p: prep_lib.preprocess(
        p["means3d"], p["scales"], p["rotations"], p["opacities"],
        p["shs"], settings))(params)

    arms, vals = {}, {}
    for f3 in (0, 1):
        a = make_arm(f3)
        inst = a["build"](prep, b)
        out = a["fwd"](inst, b)
        gimg = jnp.ones_like(out)
        gcm = a["bwd"](inst, b, gimg, out)
        loss, grads = a["step"](params, b)
        arms[f3] = a
        vals[f3] = dict(inst=inst, out=out, gimg=gimg, loss=float(loss),
                         g=grads)
        print(f"arm f3={f3} compiled, loss={float(loss):.6f}", flush=True)

    # numerics: outputs and grads must be IDENTICAL (pure scheduling)
    d_out = float(jnp.max(jnp.abs(vals[0]["out"] - vals[1]["out"])))
    gm0 = np.asarray(vals[0]["g"]["means3d"])
    gm1 = np.asarray(vals[1]["g"]["means3d"])
    rel = np.abs(gm0 - gm1).max() / max(np.abs(gm0).max(), 1e-12)
    print(f"max|dout| = {d_out:.3e}  max|dgrad|rel = {rel:.3e}", flush=True)

    names = ["fwd", "bwd", "step"]
    acc = {(n, x): [] for n in names for x in (0, 1)}
    for rnd in range(3):
        for x in (0, 1):
            a, v = arms[x], vals[x]
            acc[("fwd", x)].append(chain_time(a["fwd"], v["inst"], b))
            acc[("bwd", x)].append(
                chain_time(a["bwd"], v["inst"], b, v["gimg"], v["out"]))
            acc[("step", x)].append(chain_time(a["step"], params, b))
        print(f"round {rnd}: " + "  ".join(
            f"{n}[{x}]={acc[(n, x)][-1]:.2f}" for n in names
            for x in (0, 1)), flush=True)

    print("\nmedians (ms):", flush=True)
    for n in names:
        m0 = sorted(acc[(n, 0)])[1]
        m1 = sorted(acc[(n, 1)])[1]
        print(f"  {n:5s} highest {m0:8.2f}   f3 {m1:8.2f}   "
              f"delta {m1 - m0:+7.2f}", flush=True)


if __name__ == "__main__":
    main()
