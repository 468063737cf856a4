"""Row-major instance layout experiments (candidate build_instances rework).

Questions (chained-dispatch timing, lab_gather3.py methodology):
  1. pad [N,16] -> [N,128] + row gather [R,128] + (no transpose)
     vs current narrow gather + HBM transpose to [F, R].
  2. Can Mosaic DMA a row-major [R_pad, 128] HBM ref in [CHUNK, 128]
     blocks at CHUNK-aligned SUBLANE starts, and what does the in-kernel
     [CHUNK, :16] -> [16, CHUNK] relayout cost vs the component-major read?

Run: python exp/lab_rowmajor.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("LAB_N", 1_000_000))
R = int(os.environ.get("LAB_R", 2_048_000))
CHUNK = 256
F = 16
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
    print(f"{name:56s} {(dt - RTT)/K*1e3:9.2f} ms", flush=True)


def main():
    global RTT
    interp = jax.default_backend() != "tpu"
    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.2f} ms interp={interp}", flush=True)

    key = jax.random.PRNGKey(0)
    packed = jax.random.normal(key, (N, F), jnp.float32)
    gid = jax.random.randint(key, (R + CHUNK,), 0, N, jnp.int32)

    bar = jax.lax.optimization_barrier

    @jax.jit
    def build_current(p, g):
        g = bar(g)
        rows = bar(p[g])
        return rows.T
    chain_time("current: narrow gather [R,16] + T -> [16,R]",
               build_current, packed, gid)

    @jax.jit
    def build_wide(p, g):
        pw = jnp.pad(p, ((0, 0), (0, 128 - F)))
        g = bar(g)
        return bar(pw[g])                 # [R_pad, 128] row-major
    chain_time("wide: pad [N,128] + row gather (no T)",
               build_wide, packed, gid)

    @jax.jit
    def build_wide_cm(p, g):
        pw = jnp.pad(p, ((0, 0), (0, 128 - F)))
        g = bar(g)
        rows = bar(pw[g])
        return rows[:, :F].T              # compare incl. slice+T back
    chain_time("wide gather + slice + T -> [16,R]",
               build_wide_cm, packed, gid)

    # --- kernel DMA experiments ---------------------------------------
    inst_rm = build_wide(packed, gid)     # [R+CHUNK, 128]
    inst_cm = build_current(packed, gid)  # [16, R+CHUNK]
    nchunks_total = R // CHUNK
    NPROG = min(1872, nchunks_total)
    per = nchunks_total // NPROG

    def cm_kernel(hbm, out_ref, buf, sem):
        i = pl.program_id(0)
        base = i * per * CHUNK

        def get(slot, c):
            return pltpu.make_async_copy(
                hbm.at[:, pl.ds(base + c * CHUNK, CHUNK)],
                buf.at[slot], sem.at[slot])
        get(0, 0).start()

        def body(c, acc):
            @pl.when(c + 1 < per)
            def _():
                get((c + 1) % 2, c + 1).start()
            get(c % 2, c).wait()
            geom = buf[c % 2]              # [16, CHUNK]
            return acc + jax.lax.dot_general(
                geom[:8], geom[8:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, per, body,
                                jnp.zeros((8, 8), jnp.float32))
        out_ref[0] = acc

    def rm_kernel(hbm, out_ref, buf, sem, *, width):
        i = pl.program_id(0)
        base = i * per * CHUNK

        def get(slot, c):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(base + c * CHUNK, CHUNK), :],
                buf.at[slot], sem.at[slot])
        get(0, 0).start()

        def body(c, acc):
            @pl.when(c + 1 < per)
            def _():
                get((c + 1) % 2, c + 1).start()
            get(c % 2, c).wait()
            rows = buf[c % 2]              # [CHUNK, width]
            geom = rows[:, :16].T          # relayout [CHUNK,16]->[16,CHUNK]
            return acc + jax.lax.dot_general(
                geom[:8], geom[8:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, per, body,
                                jnp.zeros((8, 8), jnp.float32))
        out_ref[0] = acc

    def rm_notrans_kernel(hbm, out_ref, buf, sem, *, width):
        """Row-major math: no transpose, matmuls contract the CHUNK axis."""
        i = pl.program_id(0)
        base = i * per * CHUNK

        def get(slot, c):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(base + c * CHUNK, CHUNK), :],
                buf.at[slot], sem.at[slot])
        get(0, 0).start()

        def body(c, acc):
            @pl.when(c + 1 < per)
            def _():
                get((c + 1) % 2, c + 1).start()
            get(c % 2, c).wait()
            rows = buf[c % 2]              # [CHUNK, width]
            return acc + jax.lax.dot_general(
                rows[:, :8], rows[:, 8:16], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, per, body,
                                jnp.zeros((8, 8), jnp.float32))
        out_ref[0] = acc

    def call_cm(inst):
        return pl.pallas_call(
            cm_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(NPROG,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, 8, 8), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((2, F, CHUNK), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))],
            ),
            out_shape=jax.ShapeDtypeStruct((NPROG, 8, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interp,
        )(inst)

    def call_rm(kern, inst, width):
        return pl.pallas_call(
            functools.partial(kern, width=width),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(NPROG,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, 8, 8), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((2, CHUNK, width), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))],
            ),
            out_shape=jax.ShapeDtypeStruct((NPROG, 8, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interp,
        )(inst)

    chain_time("kernel read component-major [16,CHUNK] blocks",
               jax.jit(call_cm), inst_cm)
    try:
        chain_time("kernel read row-major [CHUNK,128] + in-kernel T",
                   jax.jit(lambda x: call_rm(rm_kernel, x, 128)), inst_rm)
    except Exception as e:
        print("row-major+T kernel FAILED:", str(e)[:300])
    try:
        chain_time("kernel read row-major [CHUNK,128], row-major math",
                   jax.jit(lambda x: call_rm(rm_notrans_kernel, x, 128)),
                   inst_rm)
    except Exception as e:
        print("row-major no-T kernel FAILED:", str(e)[:300])

    # narrow row-major DMA: is a [CHUNK, 16] block legal / fast?
    inst_rm16 = jax.jit(lambda p, g: bar(p[bar(g)]))(packed, gid)
    try:
        chain_time("kernel read row-major [CHUNK,16] blocks, rm math",
                   jax.jit(lambda x: call_rm(rm_notrans_kernel, x, 16)),
                   inst_rm16)
    except Exception as e:
        print("row-major [CHUNK,16] kernel FAILED:", str(e)[:300])


if __name__ == "__main__":
    main()
