#!/usr/bin/env python
"""On-chip quality convergence gate: a curve, not a point.

Trains the KITTI-shaped synthetic rehearsal scene for --iters steps on the
real TPU (full production pipeline: staged jits, densification, KNN-reg
groups active) and records test-split PSNR at geometric checkpoints. The
artifact (QUALITY_r*.json) makes quality regressions detectable the way
BENCH_r*.json makes perf regressions detectable: the gate asserts the
PSNR curve is monotone-rising (within --slack dB) and ends above
--min_psnr.

Protocol analog: the reference evaluates PSNR per scene after training
(render.py:95-106) and logs test PSNR at test_iterations during it
(train.py:187-274); no real dataset exists in this environment, so the
synthetic scene stands in.

Run: python scripts/quality_gate.py [--iters 2000] [--out QUALITY.json]
(~6-12 min on chip including compiles; CPU works too, slower.)
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests"))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--checkpoints", type=str, default="",
                   help="comma-separated eval iters (default: 1, then "
                        "iters/4 steps)")
    p.add_argument("--min_psnr", type=float, default=24.0)
    p.add_argument("--slack", type=float, default=0.5,
                   help="allowed dB dip between consecutive checkpoints")
    p.add_argument("--out", type=str, default="")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=160)
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--points", type=int, default=6000)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tests.test_data_cli import make_kitti_scene
    from adgs_tpu.data.readers import read_scene
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.trainer import Trainer

    if args.checkpoints:
        checks = [int(c) for c in args.checkpoints.split(",")]
    else:
        q = max(args.iters // 4, 1)
        checks = [1] + [q * i for i in range(1, 5) if q * i <= args.iters]

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        scene = read_scene(make_kitti_scene(
            os.path.join(td, "scene"), width=args.width,
            height=args.height, n_frames=args.frames, n_pts=args.points))
        opt = OptimizationConfig(
            iterations=args.iters, densify_from_iter=100,
            densification_interval=200, densify_until_iter=args.iters,
            opacity_reset_interval=10_000, near_idx_reset_interval=200,
            lambda_flow=0.0)
        out_dir = os.path.join(td, "out")
        tr = Trainer(scene, opt, out_dir, capacity=1 << 16,
                     env_resolution=512, capacity_quantum=4096)
        tr.train(iterations=args.iters, save_iterations=[],
                 test_iterations=checks)

        rows = []
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            for line in f:
                rows.append(json.loads(line))
    # evaluate() logs test-split rows as {"step", "psnr", "ssim"...}; train
    # scalar rows carry "total_loss" — disambiguate by key
    curve = [(r["step"], r["psnr"]) for r in rows
             if "psnr" in r and "total_loss" not in r]
    # test rows come first at each step (evaluate logs test then train
    # cameras); keep the first psnr per step
    seen, test_curve = set(), []
    for step, v in curve:
        if step not in seen:
            seen.add(step)
            test_curve.append((step, round(v, 3)))

    result = {
        "iters": args.iters,
        "scene": f"kitti-synth {args.width}x{args.height} "
                 f"x{args.frames}f {args.points}pts",
        "psnr_curve": test_curve,
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    ok = True
    msgs = []
    if not test_curve:
        ok, msgs = False, ["no PSNR checkpoints recorded"]
    else:
        for (s0, v0), (s1, v1) in zip(test_curve, test_curve[1:]):
            if v1 < v0 - args.slack:
                ok = False
                msgs.append(f"PSNR fell {v0:.2f}->{v1:.2f} dB "
                            f"(iter {s0}->{s1})")
        final = test_curve[-1][1]
        if final < args.min_psnr:
            ok = False
            msgs.append(f"final PSNR {final:.2f} < {args.min_psnr}")
        if final <= test_curve[0][1]:
            ok = False
            msgs.append("PSNR did not rise over training")
    result["pass"] = ok
    if msgs:
        result["failures"] = msgs
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
