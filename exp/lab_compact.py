"""Cost of live-gaussian compaction for the expansion table.

The windowed expansion kernel fails coverage when dead (culled/time-gated)
gaussians form long id runs (train scenes: ~50% dead). Compacting the
table to live-only rows bounds every slot block's span by BLK+1 — the
question is what the compaction costs: a sorted-unique scatter of the
[N, 8] table rows (or 8 column scatters), vs the XLA-expansion fallback
delta (~6-7 ms at 1M).

Run: python exp/lab_compact.py
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

N = int(os.environ.get("LAB_N", 1_000_000))
K = 10
RTT = 0.0


def fetch(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.sum(leaves[0].ravel()[:2].astype(jnp.float32)))


def chain_time(name, fn, *args):
    try:
        out = fn(*args)
        _ = fetch(out)
    except Exception as e:
        print(f"{name:58s}  FAILED: {str(e)[:100]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    _ = fetch(out)
    dt = time.perf_counter() - t0
    print(f"{name:58s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


def main():
    global RTT
    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    live = jnp.asarray(rng.random(N) < 0.5)
    table = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    cols = [jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
            for _ in range(8)]
    bar = jax.lax.optimization_barrier

    @jax.jit
    def comp_ids(lv):
        return jnp.cumsum(lv.astype(jnp.int32)) - 1
    chain_time("comp = cumsum(live) - 1", comp_ids, live)

    @jax.jit
    def row_scatter(tb, lv):
        comp = jnp.cumsum(lv.astype(jnp.int32)) - 1
        idx = jnp.where(lv, comp, N)
        idx = bar(idx)
        return bar(jnp.zeros((N + 1, 8), jnp.float32).at[idx].set(
            tb, mode="drop", indices_are_sorted=False,
            unique_indices=False))
    chain_time("[N,8] row scatter-set (masked idx)", row_scatter,
               table, live)

    @jax.jit
    def row_scatter_sorted(tb, lv):
        comp = jnp.cumsum(lv.astype(jnp.int32)) - 1
        idx = jnp.where(lv, comp, N)
        idx = bar(idx)
        return bar(jnp.zeros((N + 1, 8), jnp.float32).at[idx].set(
            tb, mode="drop", indices_are_sorted=True, unique_indices=True))
    chain_time("[N,8] row scatter-set sorted+unique", row_scatter_sorted,
               table, live)

    @jax.jit
    def col_scatters(cs, lv):
        comp = jnp.cumsum(lv.astype(jnp.int32)) - 1
        idx = bar(jnp.where(lv, comp, N))
        outs = []
        for c in cs:
            outs.append(bar(jnp.zeros((N + 1,), jnp.float32).at[idx].set(
                c, mode="drop", indices_are_sorted=True,
                unique_indices=True)))
        return outs
    chain_time("8x [N] col scatter-set sorted+unique", col_scatters,
               cols, live)

    @jax.jit
    def gather_form(tb, lv):
        # orig_of_comp via 1-key sort of (dead, orig)
        key = jnp.where(lv, 0, 1).astype(jnp.uint32) << 31
        key = key | jnp.arange(N, dtype=jnp.uint32)
        ks, = jax.lax.sort((key,), num_keys=1, is_stable=False),
        orig = (ks[0] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        orig = bar(orig)
        return bar(tb[orig])
    chain_time("sort live-first + [N,8] row gather", gather_form,
               table, live)


if __name__ == "__main__":
    main()
