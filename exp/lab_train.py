"""Train-step stage breakdown at bench scale (chained-dispatch methodology,
lab_gather3.py): deform, preprocess, 8ch render fwd, losses, full bwd, Adam.

Run: python exp/lab_train.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

N = int(os.environ.get("LAB_N_GAUSS", 1_000_000))
W, H = 1242, 375
K = 5
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
    dt = time.perf_counter() - t0
    print(f"{name:52s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


def main():
    global RTT
    import __graft_entry__ as ge
    from adgs_tpu.models import gaussians as gm
    from adgs_tpu.ops.flow import FlowPackage
    from adgs_tpu.render import render, compute_binning
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.losses import FrameBatch, compute_losses
    from adgs_tpu.train.optim import TrainableState, init_adam, adam_update, lr_tree

    params, state, cfg, cam, env, rays = ge._build_scene(
        n_points=N, width=W, height=H, quantum=max(4096, N // 64))
    shr = float(np.log(0.3))
    params = dataclasses.replace(params,
                                 scene_scaling=params.scene_scaling + shr,
                                 obj_scaling=params.obj_scaling + shr)
    opt = OptimizationConfig()

    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)

    nr = int(jax.jit(
        lambda p, s: compute_binning(cam, p, s, cfg, active_sh_degree=3,
                                     capacity=1 << 10).num_rendered
    )(params, state))
    CAP = -(-int(nr / 0.7) // 4096) * 4096
    print(f"num_rendered {nr} capacity {CAP}", flush=True)

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

    # stage 1: binning
    @jax.jit
    def bin_step(p, s):
        return compute_binning(cam, p, s, cfg, active_sh_degree=3,
                               capacity=CAP)
    b = bin_step(params, state)
    chain_time("bin_step (deform + prep-noSH + expand + sort)", bin_step,
               params, state)

    # stage 2: deform alone
    @jax.jit
    def deform(p, s):
        return gm.deformed_package(p, s, cfg, cam.time)
    chain_time("deformed_package fwd", deform, params, state)

    def deform_loss(p, s):
        pkg = gm.deformed_package(p, s, cfg, cam.time)
        return (jnp.sum(pkg["xyz"]) + jnp.sum(pkg["rotation"])
                + jnp.sum(pkg["opacity"]) + jnp.sum(pkg["shs"]))
    chain_time("deformed_package fwd+bwd",
               jax.jit(jax.grad(deform_loss)), params, state)

    so = jnp.zeros((params.capacity, 2), dtype=jnp.float32)

    # stage 3: full 8ch render forward
    @jax.jit
    def render8(p, s, bb):
        return render(cam, p, s, cfg, env_map=env, cam_rays=rays,
                      flow_time=jnp.float32(0.35), render_objmask=True,
                      screen_offset=so, active_sh_degree=3,
                      backend="pallas", capacity=CAP,
                      precomputed_binning=bb)["render"]
    chain_time("render fwd 8ch (deform+prep+build+kernel+env)", render8,
               params, state, b)

    # 4ch render forward for comparison
    @jax.jit
    def render4(p, s, bb):
        return render(cam, p, s, cfg, env_map=env, cam_rays=rays,
                      screen_offset=so, active_sh_degree=3,
                      backend="pallas", capacity=CAP,
                      precomputed_binning=bb)["render"]
    chain_time("render fwd 4ch (no flow/objmask)", render4, params, state, b)

    # decomposition of the 8ch-vs-4ch gap --------------------------------
    @jax.jit
    def render8_noenv(p, s, bb):
        return render(cam, p, s, cfg, env_map=None, cam_rays=None,
                      flow_time=jnp.float32(0.35), render_objmask=True,
                      screen_offset=so, active_sh_degree=3,
                      backend="pallas", capacity=CAP,
                      precomputed_binning=bb)["render"]
    chain_time("render fwd 8ch NO env map", render8_noenv, params, state, b)

    @jax.jit
    def render8_noflow(p, s, bb):
        return render(cam, p, s, cfg, env_map=env, cam_rays=rays,
                      render_objmask=True,
                      screen_offset=so, active_sh_degree=3,
                      backend="pallas", capacity=CAP,
                      precomputed_binning=bb)["render"]
    chain_time("render fwd 5ch (objmask, no flow)", render8_noflow,
               params, state, b)

    @jax.jit
    def env_bg(e):
        return e.image_background(rays, cam.world_view)
    chain_time("env image_background fwd", env_bg, env)

    @jax.jit
    def env_bg_grad(e):
        return jax.grad(
            lambda ee: jnp.sum(ee.image_background(rays, cam.world_view))
        )(e)
    chain_time("env image_background fwd+bwd", env_bg_grad, env)

    @jax.jit
    def flow_deform(p):
        return gm.deformed_xyz(p, cfg, jnp.float32(0.35))
    chain_time("deformed_xyz (flow points) fwd", flow_deform, params)

    # stage 4: losses on a precomputed package (fwd only)
    pkg = jax.jit(lambda p, s, bb: render(
        cam, p, s, cfg, env_map=env, cam_rays=rays,
        flow_time=jnp.float32(0.35), render_objmask=True, screen_offset=so,
        active_sh_degree=3, backend="pallas", capacity=CAP,
        precomputed_binning=bb))(params, state, b)

    @jax.jit
    def losses_only(pk, p):
        total, logs = compute_losses(pk, batch, p, state, cfg, opt,
                                     1.0 / 60, 20.0)
        return total
    chain_time("compute_losses fwd (on fixed pkg)", losses_only, pkg, params)

    # stage 5: full fwd+bwd (render + losses), no Adam
    def loss_fn(tr, so_):
        pk = render(cam, tr.gaussians, state, cfg, env_map=tr.env,
                    cam_rays=rays, flow_time=jnp.float32(0.35),
                    render_objmask=True, screen_offset=so_,
                    active_sh_degree=3, backend="pallas", capacity=CAP,
                    precomputed_binning=b_stop)
        total, logs = compute_losses(pk, batch, tr.gaussians, state, cfg,
                                     opt, 1.0 / 60, 20.0)
        return total
    b_stop = jax.tree.map(jax.lax.stop_gradient, b)
    tr = TrainableState(gaussians=params, env=env)
    chain_time("full loss fwd+bwd (8ch render + losses)",
               jax.jit(jax.grad(loss_fn)), tr, so)

    # losses fwd+bwd w.r.t. the render package only (isolates the loss
    # stack's backward from the render backward)
    @jax.jit
    def losses_grad(pk, p):
        diff_keys = [k for k, v in pk.items()
                     if hasattr(v, "dtype") and v.dtype == jnp.float32]

        def f(dpk):
            full = dict(pk, **dpk)
            total, _ = compute_losses(full, batch, p, state, cfg, opt,
                                      1.0 / 60, 20.0)
            return total
        return jax.grad(f)({k: pk[k] for k in diff_keys})
    chain_time("compute_losses fwd+bwd (wrt pkg)", losses_grad, pkg, params)

    # stage 6: Adam alone
    grads = jax.jit(jax.grad(loss_fn))(tr, so)
    opt_state = init_adam(tr)
    lrs = lr_tree(opt, 20.0, 10.0, jnp.float32(1000))

    @jax.jit
    def adam_only(tr_, g, os_):
        return adam_update(tr_, g, os_, lrs)
    chain_time("adam_update", adam_only, tr, grads, opt_state)


if __name__ == "__main__":
    main()
