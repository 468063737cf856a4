"""Isolate the build_instances regression: which stage of
pack -> wide gather -> slice+transpose is slow, and does source shape
(1M vs 2.3M rows) or producer fusion matter."""
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

N = 1_000_000
R = 2_048_000 + 256
RTT = 0.0


def bar(x):
    return jax.lax.optimization_barrier(x)


def fetch(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.sum(leaves[0].ravel()[:2].astype(jnp.float32)))


def chain_time(name, fn, *args, K=10):
    out = fn(*args)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    s = fetch(out)
    dt = time.perf_counter() - t0
    print(f"{name:56s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


def main():
    global RTT
    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)

    gid = jax.random.randint(key, (R,), 0, N, jnp.int32)
    cols = [jax.random.normal(key, (N, 2), jnp.float32),
            jax.random.normal(key, (N, 3), jnp.float32),
            jax.random.normal(key, (N, 1), jnp.float32),
            jnp.zeros((N, 2), jnp.float32),
            jax.random.normal(key, (N, 4), jnp.float32)]
    src128 = jax.random.normal(key, (N, 128), jnp.float32)
    src16 = jax.random.normal(key, (N, 16), jnp.float32)

    @jax.jit
    def pack_only(cs):
        return bar(jnp.concatenate(
            cs + [jnp.zeros((N, 128 - 12), jnp.float32)], axis=-1))
    chain_time("pack concat -> [N,128]", pack_only, cols)

    @jax.jit
    def pack16_only(cs):
        return bar(jnp.concatenate(
            cs + [jnp.zeros((N, 4), jnp.float32)], axis=-1))
    chain_time("pack concat -> [N,16]", pack16_only, cols)

    @jax.jit
    def gather128(m, i):
        return bar(bar(m)[bar(i)])
    chain_time("gather [N,128] param src -> [R,128]", gather128, src128, gid)

    @jax.jit
    def gather16(m, i):
        return bar(bar(m)[bar(i)])
    chain_time("gather [N,16] param src -> [R,16]", gather16, src16, gid)

    @jax.jit
    def gather128_sliceT(m, i):
        rows = bar(bar(m)[bar(i)])
        return bar(rows[:, :16].T)
    chain_time("gather128 + slice16 + T", gather128_sliceT, src128, gid)

    @jax.jit
    def gather16_T(m, i):
        rows = bar(bar(m)[bar(i)])
        return bar(rows.T)
    chain_time("gather16 + T (old path)", gather16_T, src16, gid)

    @jax.jit
    def full_new(cs, i):
        packed = jnp.concatenate(
            cs + [jnp.zeros((N, 128 - 12), jnp.float32)], axis=-1)
        packed = bar(packed)
        rows = bar(packed[bar(i)])
        return bar(rows[:, :16].T)
    chain_time("FULL new: pack128+gather+slice+T", full_new, cols, gid)

    @jax.jit
    def full_old(cs, i):
        packed = jnp.concatenate(
            cs + [jnp.zeros((N, 4), jnp.float32)], axis=-1)
        rows = bar(bar(packed)[bar(i)])
        return bar(rows.T)
    chain_time("FULL old: pack16+gather+T", full_old, cols, gid)

    # slice via dynamic_slice vs lax.slice vs separate copy
    rows128 = jax.random.normal(key, (R, 128), jnp.float32)

    @jax.jit
    def sliceT(m):
        return bar(bar(m)[:, :16].T)
    chain_time("slice16+T of [R,128]", sliceT, rows128)

    @jax.jit
    def T128(m):
        return bar(bar(m).T)
    chain_time("full T of [R,128]", T128, rows128)


if __name__ == "__main__":
    main()
