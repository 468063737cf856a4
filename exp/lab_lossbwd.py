"""Decompose the train-step BACKWARD cost (lab_train shows fwd pieces
~22ms but full loss fwd+bwd ~246ms): time grad() of each loss term and
of the env-map composite separately at the real frame size.

Run: python exp/lab_lossbwd.py
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
    dt = time.perf_counter() - t0
    print(f"{name:52s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


def main():
    global RTT
    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.2f} ms backend={jax.default_backend()}",
          flush=True)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)

    from adgs_tpu.ops import image as image_ops
    chain_time("ssim fwd", jax.jit(image_ops.ssim), img, tgt)
    chain_time("ssim fwd+bwd",
               jax.jit(jax.grad(lambda a: image_ops.ssim(a, tgt))), img)

    from adgs_tpu.ops import depth as depth_ops
    dep = jnp.asarray(rng.uniform(size=(H, W)), jnp.float32)
    dtgt = jnp.asarray(rng.uniform(size=(H, W)), jnp.float32)
    chain_time("depth_loss fwd+bwd",
               jax.jit(jax.grad(lambda d: depth_ops.depth_loss(d, dtgt))),
               dep)

    from adgs_tpu.ops import flow as flow_ops
    fx = 0.5 * W / np.tan(0.6)
    Km = jnp.asarray(np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]],
                              np.float32))
    pkgf = flow_ops.FlowPackage(
        time=jnp.float32(0.35), K=Km, R=jnp.eye(3, dtype=jnp.float32),
        T=jnp.zeros(3, jnp.float32),
        flow=jnp.asarray(rng.uniform(size=(2, H, W)), jnp.float32) * W,
        vis=jnp.ones((H, W), jnp.float32))
    img_flow = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
    opac = jnp.asarray(rng.uniform(size=(H, W)), jnp.float32)
    chain_time("flow_loss fwd+bwd",
               jax.jit(jax.grad(lambda f: flow_ops.flow_loss(
                   f, pkgf, opac, dist=0.02))), img_flow)

    # env map composite + bwd (production resolution: 8192 -> 800MB grid)
    from adgs_tpu.models.env_map import EnvironmentMap
    env = EnvironmentMap.create(8192)
    rays = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)

    def env_fwd(e):
        return jnp.sum(e.color(rays) * 1e-3)
    chain_time("env color fwd (8192 grid)", jax.jit(env_fwd), env)
    chain_time("env color fwd+bwd (8192 grid)",
               jax.jit(jax.grad(env_fwd)), env)

    # adam-style full moment update on the 800MB grid
    def adamish(g, m, v):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return g - 0.01 * m / (jnp.sqrt(v) + 1e-8), m, v
    gg = env.grid
    chain_time("adam-like update on 8192 grid", jax.jit(adamish),
               gg, gg, gg)

    # group variance reg
    No = 100_000
    A = 100_000
    vals = jnp.asarray(rng.normal(size=(No, 16, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, No, size=(A, 8)), jnp.int32)
    valid = jnp.ones((A,), jnp.float32)
    from adgs_tpu.train.losses import _group_variance_loss
    chain_time("group_variance fwd+bwd (100k x 8)",
               jax.jit(jax.grad(lambda v: _group_variance_loss(
                   v, idx, valid))), vals)

    # bce on image
    def bce_loss(p):
        p = jnp.clip(p, 1e-3, 1 - 1e-3)
        return -jnp.mean(0.3 * jnp.log(p) + 0.7 * jnp.log(1 - p))
    chain_time("bce fwd+bwd", jax.jit(jax.grad(bce_loss)), opac)


if __name__ == "__main__":
    main()
