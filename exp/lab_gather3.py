"""Calibrated gather timing through the axon tunnel.

Methodology: K dispatches then ONE host fetch of a scalar derived from the
last output; report (T - RTT)/K. Separately measure RTT with a trivial
program and check whether block_until_ready actually waits."""
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

R = 2_300_000
K = 20


def bar(x):
    return jax.lax.optimization_barrier(x)


def chain_time(name, fn, *args):
    """K serialized dispatches -> one scalar fetch."""
    def fetch(o):
        if isinstance(o, tuple):
            o = o[0]
        return float(jnp.sum(o.ravel()[:4]))
    out = fn(*args)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    s = fetch(out)
    dt = time.perf_counter() - t0
    print(f"{name:52s} {(dt - RTT)/K*1e3:9.2f} ms/call  "
          f"(total {dt*1e3:.1f}ms, s={s:.3e})")


def main():
    global RTT
    print(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)

    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = float(jnp.sum(f_tiny(tiny)))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(jnp.sum(f_tiny(tiny)))
    RTT = (time.perf_counter() - t0) / 10
    print(f"per-call RTT+overhead baseline: {RTT*1e3:.2f} ms")

    # does block_until_ready wait? time a big gather with block only
    idx = jax.random.randint(key, (R,), 0, R, jnp.int32)
    rows16 = jax.random.normal(key, (R, 16), jnp.float32)
    g16 = jax.jit(lambda m, i: bar(bar(m)[bar(i)]))
    out = g16(rows16, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = g16(rows16, idx)
    jax.block_until_ready(out)
    t_block = (time.perf_counter() - t0) / 5
    _ = float(jnp.sum(out[:1, :1]))
    print(f"block_until_ready path: {t_block*1e3:.2f} ms/call")

    chain_time("row gather [R,16] f32", g16, rows16, idx)
    rows128 = jax.random.normal(key, (R, 128), jnp.float32)
    chain_time("row gather [R,128] f32",
               jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows128, idx)
    rows16b = rows16.astype(jnp.bfloat16)
    chain_time("row gather [R,16] bf16",
               jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows16b, idx)
    idx1 = jnp.sort(idx)
    chain_time("row gather [R,16] sorted idx",
               jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows16, idx1)

    perm = jax.random.permutation(key, R).astype(jnp.int32)

    @jax.jit
    def inv_scatter(p):
        r_s = jnp.arange(R, dtype=jnp.int32)
        return bar(jnp.zeros((R,), jnp.int32).at[bar(p)].set(r_s))
    chain_time("inv via 1D scatter-set", inv_scatter, perm)

    @jax.jit
    def inv_sort(p):
        _, payload = jax.lax.sort(
            (bar(p), jnp.arange(R, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        return bar(payload)
    chain_time("inv via 1-key sort", inv_sort, perm)

    @jax.jit
    def transpose16(cm):
        return bar(bar(cm).T)
    grad_cm = jax.random.normal(key, (16, R), jnp.float32)
    chain_time("transpose [16,R]->[R,16]", transpose16, grad_cm)


if __name__ == "__main__" and "grid" not in sys.argv:
    main()
# appended: width/dtype grid (run as main part 2)
def grid():
    global RTT
    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (R,), 0, R, jnp.int32)
    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = float(jnp.sum(f_tiny(tiny)))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(jnp.sum(f_tiny(tiny)))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT: {RTT*1e3:.2f} ms")
    for w in (16, 24, 32, 64, 128, 256):
        rows = jax.random.normal(key, (R, w), jnp.float32)
        chain_time(f"row gather [R,{w}] f32",
                   jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows, idx)
    for w in (32, 64, 128, 256):
        rows = jax.random.normal(key, (R, w), jnp.float32).astype(jnp.bfloat16)
        chain_time(f"row gather [R,{w}] bf16",
                   jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows, idx)
    perm = jax.random.permutation(key, R).astype(jnp.int32)

    @jax.jit
    def inv_scatter(p):
        r_s = jnp.arange(R, dtype=jnp.int32)
        return bar(jnp.zeros((R,), jnp.int32).at[bar(p)].set(r_s))
    chain_time("inv via 1D scatter-set", inv_scatter, perm)

    @jax.jit
    def inv_sort(p):
        _, payload = jax.lax.sort(
            (bar(p), jnp.arange(R, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        return bar(payload)
    chain_time("inv via 1-key sort", inv_sort, perm)

    grad_cm = jax.random.normal(key, (16, R), jnp.float32)

    @jax.jit
    def t_pad(cm):
        rm = bar(cm).T
        return bar(jnp.pad(rm, ((0, 0), (0, 112))))
    chain_time("transpose+pad [16,R]->[R,128]", t_pad, grad_cm)

    @jax.jit
    def full_chain(cm, p):
        _, inv = jax.lax.sort(
            (bar(p), jnp.arange(R, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        rm = bar(jnp.pad(bar(cm).T, ((0, 0), (0, 112))))
        gm = bar(bar(rm)[bar(inv)])
        return bar(gm[:, :16])
    chain_time("FULL: sortinv+T+pad+gather128+slice", full_chain,
               grad_cm, perm)

    @jax.jit
    def full_chain32(cm, p):
        _, inv = jax.lax.sort(
            (bar(p), jnp.arange(R, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        rm = bar(jnp.pad(bar(cm).T, ((0, 0), (0, 16))))
        gm = bar(bar(rm)[bar(inv)])
        return bar(gm[:, :16])
    chain_time("FULL: sortinv+T+pad+gather32+slice", full_chain32,
               grad_cm, perm)


if len(sys.argv) > 1 and sys.argv[1] == "grid":
    grid()
