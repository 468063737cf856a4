"""Gather/permute rate experiments on the real TPU.

The per-instance pipeline is bounded by XLA's gather row rate (~75M rows/s
measured round-1). This lab probes what moves that wall: row width, dtype,
sortedness, split gathers, and the sort-vs-scatter inverse-permutation
build. Run: python exp/lab_gather.py
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

R = 2_300_000
N = 1_000_000


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms")
    return out


def bar(x):
    return jax.lax.optimization_barrier(x)


def main():
    print(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (R,), 0, R, jnp.int32)
    idx_sorted = jnp.sort(idx)
    # build-style: R destinations from N sources
    idxN = jax.random.randint(key, (R,), 0, N, jnp.int32)

    for w in (8, 16, 32, 128):
        rows = jax.random.normal(key, (R, w), jnp.float32)
        timeit(f"row gather [R,{w}] f32",
               jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows, idx)
    rows16 = jax.random.normal(key, (R, 16), jnp.float32)
    rows16b = rows16.astype(jnp.bfloat16)
    timeit("row gather [R,16] bf16",
           jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows16b, idx)

    timeit("row gather [R,16] sorted idx (no hint)",
           jax.jit(lambda m, i: bar(bar(m)[bar(i)])), rows16, idx_sorted)

    def g_sorted_hint(m, i):
        out = jax.lax.gather(
            bar(m), bar(i)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 16), indices_are_sorted=True)
        return bar(out)
    timeit("row gather [R,16] sorted idx + hint",
           jax.jit(g_sorted_hint), rows16, idx_sorted)

    # monotonic repeat-style indices (the expansion/build pattern)
    rep = jnp.sort(idxN)
    srcN = jax.random.normal(key, (N, 16), jnp.float32)
    timeit("build gather [N,16] -> R rows, random idx",
           jax.jit(lambda m, i: bar(bar(m)[bar(i)])), srcN, idxN)
    timeit("build gather [N,16] -> R rows, sorted idx",
           jax.jit(lambda m, i: bar(bar(m)[bar(i)])), srcN, rep)
    timeit("build gather sorted idx + hint",
           jax.jit(lambda m, i: bar(jax.lax.gather(
               bar(m), bar(i)[:, None],
               jax.lax.GatherDimensionNumbers(
                   offset_dims=(1,), collapsed_slice_dims=(0,),
                   start_index_map=(0,)),
               slice_sizes=(1, 16), indices_are_sorted=True))), srcN, rep)

    # split gathers: do K independent half-size gathers pipeline?
    def split2(m, i):
        h = R // 2
        a = bar(m)[bar(i[:h])]
        b = bar(m)[bar(i[h:])]
        return bar(a), bar(b)
    timeit("2 split gathers [R/2,16] each", jax.jit(split2), rows16, idx)

    # inverse permutation build: scatter vs sort
    perm = jax.random.permutation(key, R).astype(jnp.int32)

    def inv_scatter(p):
        r_s = jnp.arange(R, dtype=jnp.int32)
        return bar(jnp.zeros((R,), jnp.int32).at[bar(p)].set(r_s))
    timeit("inv via 1D scatter-set", jax.jit(inv_scatter), perm)

    def inv_sort(p):
        _, payload = jax.lax.sort(
            (bar(p), jnp.arange(R, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        return bar(payload)
    timeit("inv via 1-key sort + iota payload", jax.jit(inv_sort), perm)

    # full permute chains
    def chain_now(grad_cm, p):
        inv = inv_scatter(p)
        grad_rm = bar(grad_cm).T
        gm = bar(bar(grad_rm)[bar(inv)])
        return bar(gm).T
    grad_cm = jax.random.normal(key, (16, R), jnp.float32)
    timeit("permute chain: scatter+T+gather+T (current)",
           jax.jit(chain_now), grad_cm, perm)

    def chain_rm(grad_rm, p):
        inv = inv_sort(p)
        return bar(bar(grad_rm)[bar(inv)])
    timeit("permute chain: sort-inv + row gather (row-major)",
           jax.jit(chain_rm), rows16, perm)


if __name__ == "__main__":
    main()
