"""Time bin_gaussians: xla vs pallas vs auto expander at bench scale."""
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

K = 10


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
    print(f"{name:52s} {dt/K*1e3:9.2f} ms", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
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
    nr = int(jnp.sum(prep.tiles_touched))
    CAP = -(-int(nr / 0.8) // 4096) * 4096
    print(f"num_rendered {nr}, capacity {CAP}", flush=True)

    from adgs_tpu.raster.pallas import expand as ex
    offsets = binning_lib.cumsum_mxu(prep.tiles_touched)
    starts = offsets - prep.tiles_touched
    _, ok = ex.window_starts(offsets, starts, CAP)
    print(f"windows_ok = {bool(ok)}", flush=True)

    for mode in ("xla", "pallas", "auto"):
        fn = jax.jit(lambda pr, m=mode: binning_lib.bin_gaussians(
            pr, settings, capacity=CAP, expander=m).tile_start)
        chain_time(f"bin_gaussians expander={mode}", fn, prep)

    # expansion alone (pallas): table + windows + kernel, no sort
    d_bits = binning_lib.depth_bits_for(settings.num_tiles)

    @jax.jit
    def expand_only(pr):
        offs = binning_lib.cumsum_mxu(pr.tiles_touched)
        sts = offs - pr.tiles_touched
        dq = binning_lib.quantize_depth(
            pr.depth, settings.num_tiles).astype(jnp.int32)
        tbl = ex.build_table(sts, offs, pr.rect_min, pr.rect_max, dq)
        g_base, ok = ex.window_starts(offs, sts, CAP)
        k, g = ex.expand_pallas(tbl, g_base, CAP, settings.grid_x, d_bits,
                                settings.num_tiles)
        return k, g, ok
    chain_time("pallas expansion only (cumsum+table+windows+kernel)",
               expand_only, prep)

    @jax.jit
    def windows_only(pr):
        offs = binning_lib.cumsum_mxu(pr.tiles_touched)
        sts = offs - pr.tiles_touched
        return ex.window_starts(offs, sts, CAP)
    chain_time("windows only (2 searchsorted)", windows_only, prep)


if __name__ == "__main__":
    main()
