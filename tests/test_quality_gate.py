"""The quality-gate harness end-to-end at toy scale (CPU).

Covers scripts/quality_gate.py: GT-scene generation (stereo KITTI
contract, renderable ground truth), the Trainer run, and the metrics
parse into a curve — the full-scale on-chip run (QUALITY_r05.json)
asserts convergence; this test asserts the machinery."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_quality_gate_machinery(tmp_path):
    from scripts.quality_gate import build_gt_scene, run_gate

    root = str(tmp_path / "scene")
    # n_frames >= 5 so the nvs-75 split (every 4th TIME) holds out a test
    # time at all
    build_gt_scene(root, width=48, height=32, n_frames=6, n_gt=300, seed=0)
    # stereo contract: 12 images, poses.npz with repeated timestamps
    meta = np.load(os.path.join(root, "poses.npz"))
    assert meta["R"].shape[0] == 12
    assert (meta["time_stamp"][::2] == meta["time_stamp"][1::2]).all()
    # images are renders, not noise: neighbouring-pixel correlation is high
    from PIL import Image
    img = np.asarray(Image.open(
        os.path.join(root, "image", "000000.png")), np.float32) / 255.0
    dx = np.abs(np.diff(img, axis=1)).mean()
    assert dx < 0.12, f"GT image looks like noise (mean |dx| {dx:.3f})"

    curve = run_gate(root, str(tmp_path / "out"), iters=12, eval_every=6,
                     capacity=1 << 13, env_resolution=64)
    assert curve["iters"] == [1, 6, 12]
    assert np.isfinite(curve["test_psnr"]).all()
    assert np.isfinite(curve["train_psnr"]).all()
    assert len(curve["test_ssim"]) == 3
