"""Decompose the full train fwd+bwd mystery: lab_train measures ~226 ms
for grad(render8ch + losses) while the stage components sum to ~90 ms.
Arms isolate which ingredient blows up inside the combined gradient graph:
render-only grads (8ch / 4ch / no-env / no-flow), wrt-gaussians vs
wrt-(gaussians+env), losses on top.

Run: python exp/lab_trainbwd.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

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
    print(f"{name:58s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


def main():
    global RTT
    import __graft_entry__ as ge
    from adgs_tpu.models import gaussians as gm
    from adgs_tpu.ops.flow import FlowPackage
    from adgs_tpu.render import render, compute_binning
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.losses import FrameBatch, compute_losses
    from adgs_tpu.train.optim import TrainableState

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

    b = jax.jit(lambda p, s: compute_binning(
        cam, p, s, cfg, active_sh_degree=3, capacity=CAP))(params, state)
    b_stop = jax.tree.map(jax.lax.stop_gradient, b)
    so = jnp.zeros((params.capacity, 2), dtype=jnp.float32)
    tr = TrainableState(gaussians=params, env=env)

    def mk(render_kwargs, wrt="gaussians", reduce="sum"):
        def loss_fn(t):
            p = t.gaussians
            kw = dict(env_map=t.env if wrt == "both" else env,
                      cam_rays=rays)
            kw.update(render_kwargs)
            pk = render(cam, p, state, cfg,
                        screen_offset=so, active_sh_degree=3,
                        backend="pallas", capacity=CAP,
                        precomputed_binning=b_stop, **kw)
            return sum(jnp.sum(v) for k, v in pk.items()
                       if hasattr(v, "dtype") and v.dtype == jnp.float32)
        return jax.jit(jax.grad(loss_fn))

    chain_time("grad 4ch render (wrt gaussians)",
               mk(dict()), tr)
    chain_time("grad 8ch render (wrt gaussians)",
               mk(dict(flow_time=jnp.float32(0.35), render_objmask=True)), tr)
    chain_time("grad 8ch render NO env (wrt gaussians)",
               mk(dict(flow_time=jnp.float32(0.35), render_objmask=True,
                       env_map=None, cam_rays=None)), tr)
    chain_time("grad 8ch render (wrt gaussians+env)",
               mk(dict(flow_time=jnp.float32(0.35), render_objmask=True),
                  wrt="both"), tr)

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

    def full_loss(t):
        pk = render(cam, t.gaussians, state, cfg, env_map=t.env,
                    cam_rays=rays, flow_time=jnp.float32(0.35),
                    render_objmask=True, screen_offset=so,
                    active_sh_degree=3, backend="pallas", capacity=CAP,
                    precomputed_binning=b_stop)
        total, _ = compute_losses(pk, batch, t.gaussians, state, cfg,
                                  opt, 1.0 / 60, 20.0)
        return total
    chain_time("grad full (8ch + losses, wrt both)",
               jax.jit(jax.grad(full_loss)), tr)

    from adgs_tpu.train.losses import gaussian_term_losses
    import dataclasses as _dc

    @jax.jit
    def gterms_grad(p):
        return jax.grad(
            lambda pp: gaussian_term_losses(pp, state, opt, 1.0 / 60)[0])(p)
    chain_time("grad gaussian_term_losses alone (reg+sigma)", gterms_grad,
               params)

    opt_noreg = _dc.replace(opt, lambda_reg=0.0, lambda_sigma=0.0,
                            lambda_sigma_reg=0.0)

    def full_loss_noreg(t):
        pk = render(cam, t.gaussians, state, cfg, env_map=t.env,
                    cam_rays=rays, flow_time=jnp.float32(0.35),
                    render_objmask=True, screen_offset=so,
                    active_sh_degree=3, backend="pallas", capacity=CAP,
                    precomputed_binning=b_stop)
        total, _ = compute_losses(pk, batch, t.gaussians, state, cfg,
                                  opt_noreg, 1.0 / 60, 20.0)
        return total
    chain_time("grad full NO reg/sigma terms (wrt both)",
               jax.jit(jax.grad(full_loss_noreg)), tr)

    opt_noflow = _dc.replace(opt, lambda_flow=0.0)

    def full_loss_noflow(t):
        pk = render(cam, t.gaussians, state, cfg, env_map=t.env,
                    cam_rays=rays, flow_time=jnp.float32(0.35),
                    render_objmask=True, screen_offset=so,
                    active_sh_degree=3, backend="pallas", capacity=CAP,
                    precomputed_binning=b_stop)
        total, _ = compute_losses(pk, batch, t.gaussians, state, cfg,
                                  opt_noflow, 1.0 / 60, 20.0)
        return total
    chain_time("grad full NO flow loss (wrt both)",
               jax.jit(jax.grad(full_loss_noflow)), tr)


if __name__ == "__main__":
    main()
