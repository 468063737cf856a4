"""Gather rate re-check with forced host fetches (lab_gather.py showed
impossible rates — suspect block_until_ready not forcing work through the
axon tunnel, or runtime-level memoization of identical dispatches)."""
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


def bar(x):
    return jax.lax.optimization_barrier(x)


def timeit(name, fn, *args, reps=5):
    s = float(fn(*args))          # warmup + compile, host fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(fn(*args))      # scalar host fetch forces completion
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms   (sum={s:.3e})")


def main():
    print(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (R,), 0, R, jnp.int32)
    rows16 = jax.random.normal(key, (R, 16), jnp.float32)

    @jax.jit
    def g16(m, i):
        return jnp.sum(bar(bar(m)[bar(i)]))
    timeit("row gather [R,16] f32 (+sum)", g16, rows16, idx)

    # vary the index content per call so no caching layer can reuse
    @jax.jit
    def g16v(m, i, o):
        i2 = bar((i + o) % R)
        return jnp.sum(bar(bar(m)[i2]))
    for k in range(3):
        timeit(f"row gather [R,16] varying idx (call {k})", g16v, rows16,
               idx, jnp.int32(k + 1))

    @jax.jit
    def chain_rm(grad_rm, p):
        _, inv = jax.lax.sort((bar(p), jnp.arange(R, dtype=jnp.int32)),
                              num_keys=1, is_stable=False)
        return jnp.sum(bar(bar(grad_rm)[bar(inv)]))
    perm = jax.random.permutation(key, R).astype(jnp.int32)
    timeit("sort-inv + row gather (+sum)", chain_rm, rows16, perm)

    @jax.jit
    def chain_cur(grad_cm, p):
        r_s = jnp.arange(R, dtype=jnp.int32)
        inv = bar(jnp.zeros((R,), jnp.int32).at[bar(p)].set(r_s))
        grad_rm = bar(grad_cm).T
        gm = bar(bar(grad_rm)[bar(inv)])
        return jnp.sum(bar(gm).T)
    grad_cm = jax.random.normal(key, (16, R), jnp.float32)
    timeit("scatter-inv + T + gather + T (+sum)", chain_cur, grad_cm, perm)


if __name__ == "__main__":
    main()
