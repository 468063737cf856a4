"""Env-map grid-sample: forward gather and backward scatter strategies.

The naive autodiff backward (4 unsorted scatter-adds into the 800MB
8192^2 grid) measures ~168ms — the single largest cost in the train
step. Candidates:
  fwd:  4 independent gathers (current) vs one [2,2]-window gather
  bwd:  naive autodiff scatter vs flat-id sort + permute + SORTED
        scatter-add vs sorted windowed scatter
Run: python exp/lab_env.py
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
RES = 8192
K = 10
RTT = 0.0
P = H * W


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
    print(f"{name:56s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)
    return out


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
    grid = jnp.asarray(rng.normal(size=(3, RES, RES)).astype(np.float32))
    # camera-coherent coords: a smooth sky footprint (like real rays)
    yy, xx = np.meshgrid(np.linspace(0.1, 0.45, H),
                         np.linspace(-0.3, 0.3, W), indexing="ij")
    coords = np.stack([xx, yy], axis=-1).astype(np.float32)
    coords += rng.normal(size=coords.shape).astype(np.float32) * 1e-4
    coords = jnp.asarray(coords.reshape(-1, 2))      # [P,2] in [-1,1]
    g_out = jnp.asarray(rng.normal(size=(3, P)).astype(np.float32))

    x = (coords[:, 0] + 1.0) * 0.5 * (RES - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (RES - 1)
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = x - x0; wy = y - y0
    x0i = jnp.clip(x0, 0, RES - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, RES - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, RES - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, RES - 1).astype(jnp.int32)

    # ---- forward variants ----
    @jax.jit
    def fwd_4gather(gr):
        v00 = gr[:, y0i, x0i]; v01 = gr[:, y0i, x1i]
        v10 = gr[:, y1i, x0i]; v11 = gr[:, y1i, x1i]
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy
    chain_time("fwd: 4 gathers (current)", fwd_4gather, grid)

    starts = jnp.stack([y0i, x0i], axis=-1)          # [P,2]

    @jax.jit
    def fwd_window(gr):
        # one gather of [C,2,2] windows at P starts
        patch = jax.vmap(
            lambda s: jax.lax.dynamic_slice(gr, (0, s[0], s[1]), (3, 2, 2))
        )(starts)                                     # [P,3,2,2]
        top = patch[:, :, 0, 0] * (1 - wx)[:, None] \
            + patch[:, :, 0, 1] * wx[:, None]
        bot = patch[:, :, 1, 0] * (1 - wx)[:, None] \
            + patch[:, :, 1, 1] * wx[:, None]
        return (top * (1 - wy)[:, None] + bot * wy[:, None]).T
    chain_time("fwd: one [2,2]-window gather", fwd_window, grid)

    # ---- backward variants (d_grid only) ----
    w00 = (1 - wx) * (1 - wy); w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy; w11 = wx * wy

    @jax.jit
    def bwd_naive(g):
        d = jnp.zeros((3, RES, RES), jnp.float32)
        d = d.at[:, y0i, x0i].add(g * w00)
        d = d.at[:, y0i, x1i].add(g * w01)
        d = d.at[:, y1i, x0i].add(g * w10)
        d = d.at[:, y1i, x1i].add(g * w11)
        return d
    chain_time("bwd: 4 unsorted 2D scatter-adds (naive)", bwd_naive, g_out)

    ids4 = jnp.concatenate([y0i * RES + x0i, y0i * RES + x1i,
                            y1i * RES + x0i, y1i * RES + x1i])
    @jax.jit
    def bwd_flat_sorted(g):
        vals4 = jnp.concatenate([
            (g * w00).T, (g * w01).T, (g * w10).T, (g * w11).T], axis=0)
        ids_s, pos = jax.lax.sort(
            (ids4, jnp.arange(4 * P, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        pos = jax.lax.optimization_barrier(pos)
        vals_s = jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(vals4)[pos])
        d = jnp.zeros((RES * RES, 3), jnp.float32)
        d = d.at[ids_s].add(vals_s, indices_are_sorted=True)
        return d
    chain_time("bwd: flat-id sort + permute + sorted scatter",
               bwd_flat_sorted, g_out)

    @jax.jit
    def bwd_flat_unsorted(g):
        vals4 = jnp.concatenate([
            (g * w00).T, (g * w01).T, (g * w10).T, (g * w11).T], axis=0)
        d = jnp.zeros((RES * RES, 3), jnp.float32)
        d = d.at[ids4].add(vals4)
        return d
    chain_time("bwd: flat-id unsorted row scatter", bwd_flat_unsorted,
               g_out)

    # windowed scatter: [P] updates of [3,2,2] at (y0,x0) starts, sorted
    flat0 = y0i * RES + x0i
    order = jnp.argsort(flat0)

    @jax.jit
    def bwd_window_sorted(g):
        wmat = jnp.stack([w00, w01, w10, w11], axis=-1).reshape(P, 2, 2)
        upd = wmat[..., None] * g.T[:, None, None, :]   # [P,2,2,3]
        upd = upd[order]
        st = starts[order]
        dnum = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1))
        d = jax.lax.scatter_add(
            jnp.zeros((RES, RES, 3), jnp.float32), st, upd, dnum,
            indices_are_sorted=True, unique_indices=False)
        return d
    chain_time("bwd: sorted [2,2,3]-window scatter", bwd_window_sorted,
               g_out)

    # numerical check: flat_sorted vs naive on a small slice
    da = bwd_naive(g_out)
    db = bwd_flat_sorted(g_out).reshape(RES, RES, 3).transpose(2, 0, 1)
    err = float(jnp.max(jnp.abs(da - db)))
    print(f"flat_sorted vs naive max abs err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
