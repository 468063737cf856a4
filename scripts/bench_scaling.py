#!/usr/bin/env python
"""Scaling-efficiency harness: pixels/s of the sharded train step at 1, 2,
..., D devices (BASELINE.md: >=85% efficiency at N>=2 hosts, measured at
1 chip / 1 host / N hosts).

On a real pod slice this measures ICI scaling; on a single-chip or CPU
environment pass --force_cpu_devices N to validate the sharded program
structure on a virtual mesh (numbers are then structural, not performance).

  python scripts/bench_scaling.py [--devices 1 2 4 8] [--n_gauss 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", nargs="+", type=int, default=None)
    p.add_argument("--n_gauss", type=int, default=200_000)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--force_cpu_devices", type=int, default=0)
    p.add_argument("--exchange", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="primitive-exchange routing (per-device work "
                        "scales ~1/D; the all-gather tier leaves O(N) "
                        "window/bin-table work replicated). DEFAULT ON "
                        "(round-4: wins structurally at 8 dev, ~5x less "
                        "ICI volume by the PERF.md model); --no-exchange "
                        "measures the all-gather tier.")
    args = p.parse_args()

    if args.force_cpu_devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count="
                                   f"{args.force_cpu_devices}")
    import jax
    if args.force_cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from adgs_tpu.parallel.shard import make_sharded_train_step
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.losses import FrameBatch
    from adgs_tpu.train.optim import TrainableState, init_adam
    import __graft_entry__ as ge

    all_devices = jax.devices()
    dev_counts = args.devices or sorted({1, 2, len(all_devices)})
    H, W = args.height, args.width
    params, state, cfg, cam, env, rays = ge._build_scene(
        n_points=args.n_gauss, width=W, height=H, quantum=4096)
    from adgs_tpu.models.env_map import EnvironmentMap
    env = EnvironmentMap.create(resolution=256)
    opt = OptimizationConfig(lambda_flow=0.0, lambda_obj=0.0,
                             lambda_reg=0.0, lambda_sigma_reg=0.0)
    batch = FrameBatch(image=jnp.zeros((3, H, W), jnp.float32),
                       depth=jnp.ones((H, W), jnp.float32),
                       sky=jnp.zeros((H, W), jnp.float32),
                       semantic=jnp.zeros((H, W), jnp.float32))

    results = {}
    for d in dev_counts:
        if d > len(all_devices):
            print(f"# skipping {d} devices (have {len(all_devices)})")
            continue
        mesh = Mesh(np.asarray(all_devices[:d]), ("tile",))
        # per-SLAB instance capacity, autotuned from the worst slab's true
        # count (the trainer does the same via the pmax'd num_rendered in
        # the step logs) — a fixed full-scene capacity would make every
        # device pay the whole scene's integer-pipeline cost at any D
        step = make_sharded_train_step(
            cfg, opt, frame_gap=1 / 60, scene_extent=20.0,
            cameras_extent=10.0, mesh=mesh, capacity=1 << 16,
            max_per_tile=1024, primitive_exchange=args.exchange)
        opt_state = init_adam(TrainableState(gaussians=params, env=env))
        out = step(params, env, opt_state, state, cam, batch, rays,
                   jnp.float32(1), active_sh_degree=1)
        jax.block_until_ready(out)
        nr = int(out[-1]["num_rendered"])
        cap = max(4096, -(-int(nr / 0.8) // 4096) * 4096)
        if cap < (1 << 16):
            step = make_sharded_train_step(
                cfg, opt, frame_gap=1 / 60, scene_extent=20.0,
                cameras_extent=10.0, mesh=mesh, capacity=cap,
                max_per_tile=1024, primitive_exchange=args.exchange)
            out = step(params, env, opt_state, state, cam, batch, rays,
                       jnp.float32(1), active_sh_degree=1)
            jax.block_until_ready(out)
        print(f"# devices {d}: per-slab num_rendered {nr}, capacity {cap}",
              file=sys.stderr)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(params, env, opt_state, state, cam, batch, rays,
                       jnp.float32(1), active_sh_degree=1)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        pix_s = H * W * args.iters / dt
        results[d] = pix_s
        base = results[min(results)]
        eff = pix_s / (base * d / min(results))
        print(json.dumps({"devices": d, "pixels_per_sec": round(pix_s, 1),
                          "efficiency_vs_linear": round(eff, 3)}))


if __name__ == "__main__":
    main()
