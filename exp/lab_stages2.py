"""Fine-grained hot-path stage timings (chained-dispatch methodology —
see lab_gather3.py; block_until_ready through the axon tunnel is
unreliable and every host fetch costs ~35ms RTT).

Run: python exp/lab_stages2.py
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
WIDTH, HEIGHT = 1242, 375
K = 10
RTT = 0.0


def fetch(o):
    leaves = jax.tree.leaves(o)
    x = leaves[0]
    return float(jnp.sum(x.ravel()[:2].astype(jnp.float32)))


def chain_time(name, fn, *args):
    out = fn(*args)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    s = fetch(out)
    dt = time.perf_counter() - t0
    print(f"{name:48s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


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
    print(f"RTT baseline: {RTT*1e3:.2f} ms", flush=True)

    # capacity as the bench autotunes it
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
    chain_time("bin_step total (prep+expand+sort+ranges)", bin_step, params)

    @jax.jit
    def prep_nosh(p):
        return prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            None, settings)
    chain_time("preprocess fwd (no SH)", prep_nosh, params)

    @jax.jit
    def prep_sh(p):
        return prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            p["shs"], settings)
    chain_time("preprocess fwd (with SH)", prep_sh, params)

    def prep_loss(p):
        pr = prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            p["shs"], settings)
        return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.rgb)
                + jnp.sum(pr.depth) + jnp.sum(pr.opacity))
    chain_time("preprocess fwd+bwd", jax.jit(jax.grad(prep_loss)), params)

    # the sort alone at this capacity
    key = jax.random.PRNGKey(0)
    keys = jax.random.bits(key, (CAP,), jnp.uint32)
    gid = jax.random.randint(key, (CAP,), 0, N_GAUSS, jnp.int32)
    slot = jnp.arange(CAP, dtype=jnp.int32)

    @jax.jit
    def sort_only(k, g, s):
        return jax.lax.sort((k, g, s), num_keys=1, is_stable=True)
    chain_time("1-key u32 sort, 2 payloads [CAP]", sort_only, keys, gid,
               slot)

    prep = prep_sh(params)

    @jax.jit
    def build(pr, bb):
        feats = [pr.rgb,
                 cmod.depth_feature(pr.depth, settings.inv_depth)[:, None]]
        features = jnp.concatenate(feats, axis=-1)
        opac2 = jnp.where(pr.visible, pr.opacity, 0.0)
        log_op = jnp.log(jnp.maximum(opac2, pal.OP_FLOOR))
        packed, F = pal.pack_gaussian_rows(pr.mean2d, pr.conic, log_op,
                                           features)
        return pal.build_instances(bb.gauss_id, packed, F)
    chain_time("pack + build_instances (wide gather)", build, prep, b)

    inst = build(prep, b)
    F = inst.shape[0]
    ch = 4

    @jax.jit
    def fwd_kernel(i, bb):
        return pal._fwd_call(i, F, bb.tile_start, bb.tile_count,
                             settings.num_tiles, settings.grid_x, ch)
    chain_time("fwd kernel only", fwd_kernel, inst, b)
    out = fwd_kernel(inst, b)

    gimg = jnp.ones_like(out)

    @jax.jit
    def bwd_kernel(i, bb, g, o):
        return pal._bwd_call(i, F, bb.tile_start, bb.tile_count, g, o,
                             settings.num_tiles, settings.grid_x, ch,
                             i.shape[1])
    chain_time("bwd kernel only", bwd_kernel, inst, b, gimg, out)
    grad_cm = bwd_kernel(inst, b, gimg, out)

    @jax.jit
    def permute_reduce(gcm, bb):
        g_cols = gcm.shape[0]
        R = bb.gauss_id.shape[0]
        R_seg = -(-R // pal.SEG_C) * pal.SEG_C + pal.SEG_C
        _, inv = jax.lax.sort(
            (bb.slot_sorted, jnp.arange(R, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        inv = jnp.concatenate([inv, jnp.full((R_seg - R,), R, jnp.int32)])
        grad_rm = gcm.T
        inv = jax.lax.optimization_barrier(inv)
        gm_rows = jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(grad_rm)[inv])
        gm_cm = gm_rows.T
        return pal.segment_reduce_contiguous(gm_cm, bb.gauss_start,
                                             bb.num_rendered, N_GAUSS)
    chain_time("grad permute + segment reduce", permute_reduce, grad_cm, b)

    def loss_fn(p, bb):
        pr = prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            p["shs"], settings)
        out = pal.render_pallas(pr, bb, settings)
        return (jnp.mean(jnp.abs(out.color - target))
                + 0.1 * jnp.mean(out.depth))
    chain_time("full loss fwd+bwd", jax.jit(jax.value_and_grad(loss_fn)),
               params, b)


if __name__ == "__main__":
    main()
