"""Env-map grid-sample: backward scatter strategies.

The naive autodiff backward (4 unsorted scatter-adds into the 800MB
8192^2 grid) measures ~168ms — the single largest cost in the train
step. TPU layout rule discovered here: a [RES*RES, 3] operand
lane-pads 3 -> 128 (34GB) — every candidate must keep the flat cell
axis MINOR ([3, RES*RES] or per-channel [RES*RES]).

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
    try:
        out = fn(*args)
        _ = fetch(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:56s}   FAILED: {str(e)[:90]}", flush=True)
        return None
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

    # baseline: the module's own fwd+bwd (autodiff scatter)
    from adgs_tpu.models import env_map as em
    grid = jnp.asarray(rng.normal(size=(3, RES, RES)).astype(np.float32))

    def mod_loss(gr):
        return jnp.sum(em._grid_sample_align_corners(gr, coords) * 1e-3)
    chain_time("module autodiff fwd+bwd (baseline)",
               jax.jit(jax.grad(mod_loss)), grid)

    # ---- backward candidates (d_grid only) ----
    w00 = (1 - wx) * (1 - wy); w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy; w11 = wx * wy
    ids4 = jnp.concatenate([y0i * RES + x0i, y0i * RES + x1i,
                            y1i * RES + x0i, y1i * RES + x1i])

    @jax.jit
    def bwd_flat_unsorted(g):
        vals4 = jnp.concatenate(
            [g * w00, g * w01, g * w10, g * w11], axis=1)   # [3, 4P]
        d = jnp.zeros((3, RES * RES), jnp.float32)
        return d.at[:, ids4].add(vals4)
    chain_time("bwd: unsorted minor-axis scatter [3, RES^2]",
               bwd_flat_unsorted, g_out)

    @jax.jit
    def bwd_flat_sorted(g):
        vals4 = jnp.concatenate(
            [g * w00, g * w01, g * w10, g * w11], axis=1)   # [3, 4P]
        ids_s, pos = jax.lax.sort(
            (ids4, jnp.arange(4 * P, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        pos = jax.lax.optimization_barrier(pos)
        rows = jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(vals4.T)[pos])     # [4P, 3]
        vals_s = rows.T
        d = jnp.zeros((3, RES * RES), jnp.float32)
        return d.at[:, ids_s].add(vals_s, indices_are_sorted=True)
    chain_time("bwd: sort + row-permute + sorted minor scatter",
               bwd_flat_sorted, g_out)

    @jax.jit
    def bwd_1d_per_channel(g):
        outs = []
        for c in range(3):
            vals4 = jnp.concatenate(
                [g[c] * w00, g[c] * w01, g[c] * w10, g[c] * w11])
            d = jnp.zeros((RES * RES,), jnp.float32)
            outs.append(d.at[ids4].add(vals4))
        return jnp.stack(outs)
    chain_time("bwd: 3x unsorted 1D scatter", bwd_1d_per_channel, g_out)

    @jax.jit
    def bwd_1d_sorted(g):
        ids_s, pos = jax.lax.sort(
            (ids4, jnp.arange(4 * P, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        pos = jax.lax.optimization_barrier(pos)
        outs = []
        for c in range(3):
            vals4 = jnp.concatenate(
                [g[c] * w00, g[c] * w01, g[c] * w10, g[c] * w11])
            vals_s = jax.lax.optimization_barrier(vals4)[pos]
            d = jnp.zeros((RES * RES,), jnp.float32)
            outs.append(d.at[ids_s].add(vals_s, indices_are_sorted=True))
        return jnp.stack(outs)
    chain_time("bwd: sort + 3x sorted 1D scatter", bwd_1d_sorted, g_out)

    # windowed [2,2] scatter per channel into a 1-padded grid: 4x fewer
    # updates than scalar taps. Padding both sides keeps every window
    # in-bounds (XLA drops whole OOB windows, which would lose the valid
    # tap of an edge pixel); OOB taps carry w=0 so pad cells only ever
    # receive zeros.
    starts = jnp.stack([y0i, x0i], axis=-1)  # clipped starts; see note
    y0u = jnp.floor(y).astype(jnp.int32) + 1   # unclipped, shifted by pad
    x0u = jnp.floor(x).astype(jnp.int32) + 1
    startsu = jnp.stack([y0u, x0u], axis=-1)

    @jax.jit
    def bwd_window_per_channel(g):
        wmat = jnp.stack([w00, w01, w10, w11], axis=-1).reshape(P, 2, 2)
        dnum = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1))
        outs = []
        for c in range(3):
            upd = wmat * g[c][:, None, None]
            d = jax.lax.scatter_add(
                jnp.zeros((RES + 2, RES + 2), jnp.float32), startsu, upd,
                dnum, indices_are_sorted=False, unique_indices=False)
            outs.append(d[1:-1, 1:-1])
        return jnp.stack(outs)
    chain_time("bwd: 3x [2,2]-window scatter (padded)",
               bwd_window_per_channel, g_out)

    # windowed [2,2] gather forward per channel
    @jax.jit
    def fwd_window(gr):
        grp = jnp.pad(gr, ((0, 0), (1, 1), (1, 1)))
        dnum = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        outs = []
        wmat = jnp.stack([w00, w01, w10, w11], axis=-1).reshape(P, 2, 2)
        for c in range(3):
            patch = jax.lax.gather(
                grp[c], startsu, dnum, slice_sizes=(2, 2),
                indices_are_sorted=False, unique_indices=False)  # [P,2,2]
            outs.append(jnp.sum(patch * wmat, axis=(1, 2)))
        return jnp.stack(outs)
    chain_time("fwd: 3x [2,2]-window gather (padded)", fwd_window, grid)

    @jax.jit
    def fwd_4gather(gr):
        v = 0.0
        for xi, yi, w in ((x0i, y0i, w00), (x1i, y0i, w01),
                          (x0i, y1i, w10), (x1i, y1i, w11)):
            v = v + gr[:, yi, xi] * w[None]
        return v
    chain_time("fwd: 4 scalar gathers (current)", fwd_4gather, grid)

    wcheck = bwd_window_per_channel(g_out)
    scheck = bwd_1d_per_channel(g_out)
    if wcheck is not None and scheck is not None:
        err = float(jnp.max(jnp.abs(
            wcheck - scheck.reshape(3, RES, RES))))
        print(f"window vs 1D scatter max abs err: {err:.2e}", flush=True)

    # numerical check vs baseline on whichever worked
    base = jax.jit(jax.grad(mod_loss))(grid)
    cand = bwd_flat_sorted(g_out)
    if cand is not None:
        # baseline used g = 1e-3 per element; rescale candidate comparison
        cand2 = bwd_flat_sorted(jnp.full_like(g_out, 1e-3))
        err = float(jnp.max(jnp.abs(
            base.reshape(3, -1) - cand2)))
        print(f"sorted-candidate vs autodiff max abs err: {err:.2e}",
              flush=True)


if __name__ == "__main__" and not (len(sys.argv) > 1
                                   and sys.argv[1] == "blocked"):
    main()


def main2():
    """Blocked Pallas grid sample vs the generic paths at the production
    shape (run: python exp/lab_env.py blocked)."""
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
    from adgs_tpu.models.env_map import (camera_rays, direction_to_angles,
                                         _grid_sample_align_corners)
    from adgs_tpu.ops.grid_sample import grid_sample_image
    rays = camera_rays(focal=707.0, height=H, width=W)
    world = np.stack([rays[..., 2], rays[..., 0], -rays[..., 1]],
                     -1).astype(np.float32)
    coords = direction_to_angles(jnp.asarray(world)) * jnp.asarray(
        [1 / np.pi, 2 / np.pi], jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))

    chain_time("blocked fwd", jax.jit(grid_sample_image), grid, coords)
    chain_time("generic fwd", jax.jit(_grid_sample_align_corners), grid,
               coords)
    chain_time("blocked fwd+bwd", jax.jit(jax.grad(
        lambda g: jnp.sum(grid_sample_image(g, coords) * wgt))), grid)
    chain_time("generic fwd+bwd", jax.jit(jax.grad(
        lambda g: jnp.sum(_grid_sample_align_corners(g, coords) * wgt))),
        grid)
    a = grid_sample_image(grid, coords)
    b = _grid_sample_align_corners(grid, coords)
    print("fwd parity:", float(jnp.max(jnp.abs(a - b))), flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "blocked":
    main2()
    sys.exit(0)
