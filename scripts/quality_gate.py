#!/usr/bin/env python
"""On-chip quality convergence gate: train on a synthetic KITTI-contract
scene whose ground-truth images are RENDERS of a known Gaussian world, and
record the test-split PSNR curve as a JSON artifact.

This is the round-5 answer to "quality evidence stops at a point": the
reference protocol measures PSNR/SSIM per scene at fixed iterations
(/root/reference/render.py:95-106, train.py:187-274); no real dataset
exists in this environment, so the gate trains against self-consistent
multi-view renders (a known-recoverable world) and asserts the curve
RISES — a regression in any part of the pipeline (binning, kernels,
losses, densification, optimizer) shows up as a flat or falling curve.

Usage:
  python scripts/quality_gate.py                 # full gate (~2k iters)
  python scripts/quality_gate.py --iters 60 --width 96 --height 64 \
      --no-assert                                # smoke (CI uses this)

Writes --out (default QUALITY.json):
  {"iters": [...], "test_psnr": [...], "train_psnr": [...],
   "gain_db": ..., "monotone_ok": ..., "final_test_psnr": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_gt_scene(root: str, width: int, height: int, n_frames: int,
                   n_gt: int, seed: int = 0, backend: str = "auto"):
    """Write a KITTI-contract scene directory (poses.npz, image/, depth/,
    semantic/, sky/, flow/, points3d-75.ply — scripts/kitti/kitti.py
    layout, dataset_readers.py:142-259 semantics) whose images are renders
    of a random static Gaussian world from a driving-like camera path.

    The init point cloud is a subsampled + jittered copy of the world's
    means, so training is a recoverable inverse problem: PSNR must rise.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from adgs_tpu.core.camera import Camera, focal2fov
    from adgs_tpu.data import ply as ply_lib
    from adgs_tpu.raster.api import rasterize
    from adgs_tpu.render import settings_for_camera

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for d in ["image", "depth", "semantic", "sky", "flow/nvs-75"]:
        os.makedirs(os.path.join(root, d), exist_ok=True)

    # --- ground-truth world: a static Gaussian "street" slab ------------
    xyz = np.zeros((n_gt, 3), np.float32)
    xyz[:, 2] = rng.uniform(3.0, 40.0, n_gt)              # depth ahead
    xyz[:, 0] = rng.uniform(-1.0, 1.0, n_gt) * xyz[:, 2] * 0.55
    xyz[:, 1] = rng.uniform(-0.6, 0.85, n_gt) * xyz[:, 2] * 0.35
    K = 16
    shs = np.zeros((n_gt, K, 3), np.float32)
    # smooth albedo field so neighbouring gaussians correlate like a scene
    freq = rng.normal(size=(3, 3)) * 0.35
    shs[:, 0] = 0.9 * np.sin(xyz @ freq.T) + rng.normal(size=(n_gt, 3)) * 0.25
    shs[:, 1:] = rng.normal(size=(n_gt, K - 1, 3)) * 0.03
    scales = (np.exp(rng.normal(size=(n_gt, 3)) * 0.35)
              * xyz[:, 2:3] * 0.012).astype(np.float32)
    quats = rng.normal(size=(n_gt, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.35, 0.95, n_gt).astype(np.float32)

    focal = 0.62 * width
    fovx, fovy = focal2fov(focal, width), focal2fov(focal, height)

    # KITTI contract: stereo pairs sharing a timestamp (readers.py
    # _DATASET_SPECS pins num_cam=2 for kitti; the nvs-75 split holds out
    # every 4th TIME, both cameras)
    num_cam = 2
    total = n_frames * num_cam
    time_stamp = np.repeat(np.arange(n_frames), num_cam).astype(np.float64)
    t_idx = np.arange(total) // num_cam
    c_idx = np.arange(total) % num_cam
    R = np.tile(np.eye(4), (total, 1, 1))
    T = np.zeros((total, 4))
    # forward drive with slight lateral sway + a stereo baseline
    # (reader convention: x_cam = R x + T)
    T[:, 2] = 4.0 - 0.35 * t_idx
    T[:, 0] = 0.08 * np.sin(t_idx * 0.9) + 0.25 * c_idx
    np.savez(os.path.join(root, "poses.npz"), time_stamp=time_stamp,
             R=R, T=T, height=height, width=width, focal=focal)

    gt = dict(means3d=jnp.asarray(xyz), shs=jnp.asarray(shs),
              scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
              opacities=jnp.asarray(opac))

    @jax.jit
    def render_pose(cam):
        settings = settings_for_camera(cam, sh_degree=3, inv_depth=True)
        out = rasterize(settings=settings, backend="xla", **gt)
        return out.color, out.depth[0], 1.0 - out.opacity[0]

    for i in range(total):
        cam = Camera.create(R=R[i, :3, :3], T=T[i, :3], fovx=fovx,
                            fovy=fovy, width=width, height=height)
        color, depth, final_t = render_pose(cam)
        img = np.clip(np.asarray(color).transpose(1, 2, 0), 0.0, 1.0)
        name = f"{i:06d}"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "image", name + ".png"))
        np.save(os.path.join(root, "depth", name + ".npy"),
                np.asarray(depth)[..., None].astype(np.float32))
        np.save(os.path.join(root, "semantic", "mask_" + name + ".npy"),
                np.zeros((height, width), np.int32))
        np.save(os.path.join(root, "sky", "mask_" + name + ".npy"),
                (np.asarray(final_t) > 0.95).astype(np.uint8))
        Kmat = np.array([[focal, 0, width / 2], [0, focal, height / 2],
                         [0, 0, 1.0]])
        pkg = [np.float64(time_stamp[i]), Kmat, R[i, :3, :3], T[i, :3],
               np.zeros((2, height, width), np.float32),
               np.zeros((height, width), np.float32)]
        np.savez(os.path.join(root, "flow", "nvs-75", name + ".npz"),
                 flow=np.asarray([pkg], dtype=object))

    # --- init point cloud: recoverable-but-imperfect ---------------------
    sub = rng.permutation(n_gt)[: max(256, n_gt // 2)]
    pts = xyz[sub] + rng.normal(size=(len(sub), 3)).astype(np.float32) * 0.10
    C0 = 0.28209479177387814
    cols = np.clip(shs[sub, 0] * C0 + 0.5, 0.0, 1.0) * 255.0
    obj = (rng.random(len(sub)) < 0.25).astype(np.float32)
    tms = rng.uniform(0, n_frames - 1, len(sub)).astype(np.float32)
    ply_lib.store_point_cloud(os.path.join(root, "points3d-75.ply"),
                              pts, cols, tms, obj)
    ply_lib.store_point_cloud(os.path.join(root, "colmap-75.ply"),
                              pts[::4], cols[::4])
    return root


def run_gate(scene_root: str, out_dir: str, iters: int, eval_every: int,
             backend: str = "auto", capacity: int = 1 << 15,
             env_resolution: int = 512):
    from adgs_tpu.data.readers import read_scene
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.trainer import Trainer

    scene = read_scene(scene_root)
    opt = OptimizationConfig(
        iterations=iters,
        densify_from_iter=min(500, iters // 4),
        densification_interval=100,
        densify_until_iter=int(iters * 0.8),
        opacity_reset_interval=max(3000, iters + 1),
        near_idx_reset_interval=200,
        lambda_flow=0.0,
        data_sample="stack")
    tr = Trainer(scene, opt, out_dir, capacity=capacity,
                 env_resolution=env_resolution, capacity_quantum=1024,
                 backend=backend)
    evals = sorted({1, *range(eval_every, iters + 1, eval_every), iters})
    tr.train(iterations=iters, save_iterations=[iters],
             test_iterations=evals)
    rows = []
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    curve = {"iters": [], "test_psnr": [], "train_psnr": [],
             "test_ssim": []}
    for it in evals:
        te = [r for r in rows if r.get("step") == it
              and r.get("split") == "test" and "psnr" in r]
        trn = [r for r in rows if r.get("step") == it
               and r.get("split") == "train" and "psnr" in r]
        if te:
            curve["iters"].append(it)
            curve["test_psnr"].append(round(te[-1]["psnr"], 3))
            curve["test_ssim"].append(round(te[-1]["ssim"], 4))
            curve["train_psnr"].append(
                round(trn[-1]["psnr"], 3) if trn else None)
    return curve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--eval_every", type=int, default=250)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=160)
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--n_gt", type=int, default=6000)
    p.add_argument("--backend", default="auto")
    p.add_argument("--out", default="QUALITY.json")
    p.add_argument("--scene_dir", default=None,
                   help="keep/reuse the generated scene here")
    p.add_argument("--min_gain_db", type=float, default=4.0)
    p.add_argument("--min_final_db", type=float, default=22.0)
    p.add_argument("--no-assert", dest="do_assert", action="store_false")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    import tempfile
    ctx = (tempfile.TemporaryDirectory() if args.scene_dir is None
           else None)
    base = ctx.name if ctx is not None else args.scene_dir
    try:
        scene_root = os.path.join(base, "scene")
        if not os.path.exists(os.path.join(scene_root, "poses.npz")):
            build_gt_scene(scene_root, args.width, args.height,
                           args.n_frames, args.n_gt, backend=args.backend)
        curve = run_gate(scene_root, os.path.join(base, "out"),
                         args.iters, args.eval_every, backend=args.backend)
    finally:
        if ctx is not None:
            ctx.cleanup()

    t = curve["test_psnr"]
    result = dict(curve)
    result["final_test_psnr"] = t[-1] if t else None
    result["gain_db"] = round(t[-1] - t[0], 3) if len(t) > 1 else None
    # monotone up to a small eval-noise tolerance: every later point must
    # stay within 0.5 dB of the best seen so far
    mono = all(t[i] >= max(t[: i + 1]) - 0.5 for i in range(len(t)))
    result["monotone_ok"] = bool(mono)
    result["backend"] = jax.default_backend()
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f)
    if args.do_assert:
        assert t, "no test PSNR rows recorded"
        assert np.isfinite(t).all(), f"non-finite PSNR: {t}"
        assert mono, f"test PSNR not monotone-rising: {t}"
        assert result["gain_db"] >= args.min_gain_db, \
            f"gain {result['gain_db']} dB < {args.min_gain_db}"
        assert t[-1] >= args.min_final_db, \
            f"final PSNR {t[-1]} < {args.min_final_db}"
        print("QUALITY GATE OK", file=sys.stderr)


if __name__ == "__main__":
    main()
