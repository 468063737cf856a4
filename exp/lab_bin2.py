"""Binning micro: narrow-table gather width scaling + new bin_gaussians
total (MXU cumsum + sorted-scatter hint)."""
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
R = 2_048_000
N = 1_000_000


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
    _ = fetch(out)
    dt = time.perf_counter() - t0
    print(f"{name:52s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


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

    idx = jax.random.randint(key, (R,), 0, N, jnp.int32)
    for w in (1, 2, 3, 5):
        src = jax.random.randint(key, (N, w), 0, 1000, jnp.int32)
        chain_time(f"int32 table gather [N,{w}] -> R rows",
                   jax.jit(lambda m, i: bar(bar(m)[bar(i)])), src, idx)
    src1 = jax.random.randint(key, (N,), 0, 1000, jnp.int32)
    chain_time("int32 1-D gather [N] -> R",
               jax.jit(lambda m, i: bar(bar(m)[bar(i)])), src1, idx)

    # new bin_gaussians total
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

    @jax.jit
    def bin_total(pr):
        b = binning_lib.bin_gaussians(pr, settings, capacity=R)
        return b.tile_start
    chain_time("bin_gaussians total (mxu cumsum + sorted scatter)",
               bin_total, prep)


if __name__ == "__main__":
    main()
