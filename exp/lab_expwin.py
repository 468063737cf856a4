"""Sweep the expansion kernel's (BLK, GW) window shape.

The membership compare costs nblocks x BLK x GW = capacity x GW element
ops — GW=1024 covers BLK=512 live gaussians at >=1/2 density, but the
same 1/2 margin holds at (256, 512) with half the compare volume.
Measures bin_step total (prep + expand + sort + ranges), interleaved.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab_stages import make_inputs
from adgs_tpu.raster import preprocess as prep_lib
from adgs_tpu.raster import binning as binning_lib
from adgs_tpu.raster.pallas import expand as expand_lib

params, target, settings = make_inputs()

CONFIGS = [(256, 512), (256, 384), (128, 256),
           (256, 512), (256, 384), (128, 256)]
K = 20


@jax.jit
def probe(p):
    prep = prep_lib.preprocess(p["means3d"], p["scales"], p["rotations"],
                               p["opacities"], None, settings)
    return jnp.sum(prep.tiles_touched)


nr = int(probe(params))
CAP = -(-int(nr / 0.8) // 4096) * 4096
print(f"num_rendered {nr} capacity {CAP}", flush=True)


def fetch(o):
    return float(jnp.sum(o.gauss_id[:2]))


steps = {}
res = {}
for blk, gw in CONFIGS:
    key = (blk, gw)
    expand_lib.BLK, expand_lib.GW = blk, gw
    if key not in steps:
        @jax.jit
        def bin_step(p):
            prep = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                None, settings)
            return binning_lib.bin_gaussians(prep, settings, capacity=CAP,
                                             expander="pallas")
        t0 = time.perf_counter()
        b = bin_step(params)
        fetch(b)
        print(f"# ({blk},{gw}) compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        steps[key] = bin_step
    fn = steps[key]
    out = fn(params)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(params)
    s = fetch(out)
    dt = (time.perf_counter() - t0) / K
    res.setdefault(key, []).append(dt * 1e3)
    print(f"BLK={blk} GW={gw}: bin_step {dt*1e3:.2f} ms", flush=True)

# sanity: all configs produce identical binnings (vs the first config)
ref_key = CONFIGS[0]
expand_lib.BLK, expand_lib.GW = ref_key
ref = steps[ref_key](params)
for key, fn in steps.items():
    expand_lib.BLK, expand_lib.GW = key
    b = fn(params)
    ok = (bool(jnp.all(b.gauss_id == ref.gauss_id))
          and bool(jnp.all(b.tile_start == ref.tile_start))
          and bool(jnp.all(b.slot_sorted == ref.slot_sorted)))
    print(f"parity {key}: {ok}", flush=True)

for k, v in sorted(res.items()):
    print(f"BLK,GW {k}: {['%.2f' % x for x in v]} ms")
