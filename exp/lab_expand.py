"""Expansion/ranges breakdown + train-step stage breakdown.

Run: python exp/lab_expand.py [expand] [train]
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

RTT = 0.0
K = 10


def bar(x):
    return jax.lax.optimization_barrier(x)


def fetch(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.sum(leaves[0].ravel()[:2].astype(jnp.float32)))


def chain_time(name, fn, *args):
    out = fn(*args)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    s = fetch(out)
    dt = time.perf_counter() - t0
    print(f"{name:52s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


def calibrate():
    global RTT
    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)


def expand_stages():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from lab_stages import make_inputs
    from adgs_tpu.raster import preprocess as prep_lib
    from adgs_tpu.raster import binning as binning_lib
    params, _, settings = make_inputs()

    @jax.jit
    def prep_nosh(p):
        return prep_lib.preprocess(
            p["means3d"], p["scales"], p["rotations"], p["opacities"],
            None, settings)
    prep = prep_nosh(params)
    CAP = 2_048_000
    N = prep.tiles_touched.shape[0]
    num_tiles = settings.num_tiles

    @jax.jit
    def scatter_cumsum(pr):
        tiles = pr.tiles_touched
        offsets = jnp.cumsum(tiles)
        starts = (offsets - tiles).astype(jnp.int32)
        bump = jnp.zeros(CAP, jnp.int32).at[starts].add(
            jnp.ones_like(starts), mode="drop")
        gid = jnp.cumsum(bump) - 1
        return bar(gid), offsets[-1]
    chain_time("expansion: scatter bump + 2 cumsums", scatter_cumsum, prep)
    gid, _ = scatter_cumsum(prep)

    @jax.jit
    def table_gather(pr, g):
        tiles = pr.tiles_touched
        offsets = jnp.cumsum(tiles)
        starts = (offsets - tiles).astype(jnp.int32)
        d_bits = binning_lib.depth_bits_for(num_tiles)
        depth_q = binning_lib.quantize_depth(
            pr.depth, num_tiles).astype(jnp.int32)
        table = jnp.stack([starts,
                           pr.rect_min[:, 0], pr.rect_min[:, 1],
                           pr.rect_max[:, 0], depth_q], axis=-1)
        g = bar(g)
        return bar(table[g])
    chain_time("expansion: [N,5] table gather (R rows)", table_gather,
               prep, gid)

    @jax.jit
    def ranges(pr):
        b = binning_lib.bin_gaussians(pr, settings, capacity=CAP)
        return b.tile_start
    # full bin for reference
    chain_time("bin_gaussians total (prep precomputed)", ranges, prep)


def train_stages():
    import __graft_entry__ as ge
    from adgs_tpu.models.gaussians import (deformed_package,
                                           activated_scaling)
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.losses import FrameBatch, compute_losses
    from adgs_tpu.train.optim import TrainableState, init_adam, adam_update, lr_tree
    from adgs_tpu.ops.flow import FlowPackage
    from adgs_tpu import render as render_lib

    W, H = 1242, 375
    params, state, cfg, cam, env, rays = ge._build_scene(
        n_points=1_000_000, width=W, height=H, quantum=65536)
    opt = OptimizationConfig()
    rng = np.random.default_rng(1)
    fx = 0.5 * W / np.tan(0.6)
    Km = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    batch = FrameBatch(
        image=jnp.asarray(rng.uniform(size=(3, H, W)), dtype=jnp.float32),
        depth=jnp.ones((H, W), jnp.float32),
        sky=jnp.zeros((H, W), jnp.float32),
        semantic=jnp.asarray(rng.random((H, W)) < 0.3, dtype=jnp.float32),
        flow=FlowPackage(
            time=jnp.float32(0.35), K=jnp.asarray(Km),
            R=jnp.eye(3, dtype=jnp.float32), T=jnp.zeros(3, jnp.float32),
            flow=jnp.asarray(rng.uniform(size=(2, H, W)),
                             dtype=jnp.float32) * W,
            vis=jnp.ones((H, W), jnp.float32)),
        flow_valid=jnp.asarray(True))

    @jax.jit
    def deform_only(p, s):
        pkg = deformed_package(p, s, cfg, cam.time)
        return pkg["xyz"]
    chain_time("deformed_package (spline eval)", deform_only, params, state)

    @jax.jit
    def adam_only(p, e):
        tr = TrainableState(gaussians=p, env=e)
        opt_state = init_adam(tr)
        grads = jax.tree.map(jnp.ones_like, tr)
        lrs = lr_tree(opt, 20.0, 10.0, jnp.float32(1000))
        new_tr, new_opt = adam_update(tr, grads, opt_state, lrs)
        return new_tr.gaussians.scene_xyz
    chain_time("adam_update (incl. init; ~2x real)", adam_only, params, env)

    # losses on a fixed rendered package
    bin_fn = jax.jit(lambda p, s: render_lib.compute_binning(
        cam, p, s, cfg, active_sh_degree=3, capacity=2_048_000))
    b = bin_fn(params, state)

    @jax.jit
    def render_only(p, s, e, bb):
        return render_lib.render(
            cam, p, s, cfg, env_map=e, cam_rays=rays,
            flow_time=batch.flow.time, render_objmask=True,
            screen_offset=jnp.zeros((p.capacity, 2), jnp.float32),
            active_sh_degree=3, backend="pallas", capacity=2_048_000,
            precomputed_binning=bb)
    chain_time("render fwd only (8ch, deform)", render_only, params, state,
               env, b)
    pkg = render_only(params, state, env, b)

    @jax.jit
    def losses_only(pk, p, s):
        total, logs = compute_losses(pk, batch, p, s, cfg, opt, 1.0 / 60,
                                     20.0)
        return total
    chain_time("compute_losses fwd only", losses_only, pkg, params, state)

    def loss_full(p, e, s):
        so = jnp.zeros((p.capacity, 2), jnp.float32)
        pk = render_lib.render(
            cam, p, s, cfg, env_map=e, cam_rays=rays,
            flow_time=batch.flow.time, render_objmask=True,
            screen_offset=so, active_sh_degree=3, backend="pallas",
            capacity=2_048_000, precomputed_binning=b)
        total, _ = compute_losses(pk, batch, p, s, cfg, opt, 1.0 / 60, 20.0)
        return total
    chain_time("render+losses fwd+bwd (grad)",
               jax.jit(jax.grad(loss_full)), params, env, state)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    calibrate()
    stages = set(sys.argv[1:]) or {"expand", "train"}
    if "expand" in stages:
        expand_stages()
    if "train" in stages:
        train_stages()


if __name__ == "__main__":
    main()
