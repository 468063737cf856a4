"""Realistic-scale dress rehearsal: raw KITTI-MOT fixture -> convert_kitti
-> pseudo-labels -> segment_pcd -> triangulate -> validate -> train with
densification + an instance-capacity-growth event -> save -> resume ->
train further, with PSNR rising (reference full-loop behavior,
train.py:32-167 + the scripts/ offline pipeline).

The raw fixture is geometrically consistent: a static ego (all-zero OXTS)
with a stereo baseline views a textured plane at z=5; the velodyne sweeps
sample that plane, so the converter's pose chain, the SIFT triangulation,
and the mask->point tagging all see the same world.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

cv2 = pytest.importorskip("cv2")

REPO = os.path.join(os.path.dirname(__file__), "..")

W, H = 96, 64
FOCAL = 90.0
BASELINE = 0.5
N_FRAMES = 6
PLANE_Z = 5.0


def _K():
    return np.array([[FOCAL, 0, W / 2.0], [0, FOCAL, H / 2.0], [0, 0, 1.0]])


def _plane_texture(rng):
    tex = (rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
    return cv2.resize(tex, (W * 4, H * 4), interpolation=cv2.INTER_NEAREST)


def _render_plane(tex, T):
    """Image of the textured plane z=PLANE_Z from a camera at R=I, T."""
    span = 4.0  # plane x,y in [-span, span] maps onto the texture
    A = np.array([[(W * 4) / (2 * span), 0, W * 2],
                  [0, (H * 4) / (2 * span), H * 2],
                  [0, 0, 1.0]])
    K = _K()
    M = K @ np.stack([np.eye(3)[:, 0], np.eye(3)[:, 1],
                      np.eye(3)[:, 2] * PLANE_Z + T], axis=1)
    Hmat = M @ np.linalg.inv(A)
    return cv2.warpPerspective(tex, Hmat, (W, H))


def make_raw_kitti(root, rng):
    """Minimal KITTI-MOT tracking layout for scripts/convert_kitti.py."""
    scene = "0001"
    part = "training"
    left = os.path.join(root, "data_tracking_image_2", part, "image_02",
                        scene)
    right = os.path.join(root, "data_tracking_image_3", part, "image_03",
                         scene)
    oxts_d = os.path.join(root, "data_tracking_oxts", part, "oxts")
    calib_d = os.path.join(root, "data_tracking_calib", part, "calib")
    velo = os.path.join(root, "data_tracking_velodyne", part, "velodyne",
                        scene)
    for d in (left, right, oxts_d, calib_d, velo):
        os.makedirs(d, exist_ok=True)

    tex = _plane_texture(rng)
    img_l = _render_plane(tex, np.zeros(3))
    img_r = _render_plane(tex, np.array([-BASELINE, 0.0, 0.0]))
    for i in range(N_FRAMES):
        Image.fromarray(img_l).save(os.path.join(left, f"{i:06d}.png"))
        Image.fromarray(img_r).save(os.path.join(right, f"{i:06d}.png"))
        # velodyne sweep: plane points inside the frustum (identity
        # transforms make velo == cam == world frame)
        pts = np.zeros((400, 4), np.float32)
        pts[:, 0] = rng.uniform(-3.0, 3.0, 400)
        pts[:, 1] = rng.uniform(-2.0, 2.0, 400)
        pts[:, 2] = PLANE_Z
        pts[:, 3] = 1.0
        pts.tofile(os.path.join(velo, f"{i:06d}.bin"))

    # static ego: all-zero OXTS rows (lat lon alt roll pitch yaw)
    np.savetxt(os.path.join(oxts_d, scene + ".txt"),
               np.zeros((N_FRAMES, 6)))

    K = _K()
    P2 = K @ np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    P3 = K @ np.concatenate(
        [np.eye(3), np.array([[-BASELINE], [0.0], [0.0]])], axis=1)
    lines = [
        "P0: " + " ".join(map(str, P2.ravel())),
        "P1: " + " ".join(map(str, P2.ravel())),
        "P2: " + " ".join(map(str, P2.ravel())),
        "P3: " + " ".join(map(str, P3.ravel())),
        "R_rect " + " ".join(map(str, np.eye(3).ravel())),
        "Tr_velo_cam " + " ".join(map(str, np.eye(4)[:3].ravel())),
        "Tr_imu_velo " + " ".join(map(str, np.eye(4)[:3].ravel())),
    ]
    with open(os.path.join(calib_d, scene + ".txt"), "w") as f:
        f.write("\n".join(lines))
    return root, scene


def write_pseudo_labels(dst, rng):
    """The external-net outputs (DPT depth, SAM masks, flow) the reference
    produces in separate conda envs — synthesized here through the
    model-agnostic packagers (geometry/pseudo_labels.py): raw point tracks
    -> flow packages, mask/depth dicts -> reference file layout. The scene
    is static, so ground-truth tracks are identity with vis=1 — the flow
    loss is ACTIVE (non-degenerate targets) during training below."""
    from adgs_tpu.geometry import pseudo_labels as pk

    n_imgs = 2 * N_FRAMES
    sem = np.zeros((H, W), np.int32)
    sem[H // 3: H // 2, W // 3: W // 2] = 1   # a static object region
    sky = np.zeros((H, W), np.uint8)
    sky[: H // 8] = 1
    depths, sems, skies = {}, {}, {}
    for i in range(n_imgs):
        name = f"{i:06d}"
        depths[name] = np.full((H, W), 1.0 / PLANE_Z, np.float32)
        sems[name] = sem
        skies[name] = sky
    pk.import_depth_maps(dst, depths, normalize=False)
    pk.import_semantic_masks(dst, sems)
    pk.import_semantic_masks(dst, skies, kind="sky")

    # raw tracks at every dynamic-mask pixel (flow.py:436-438 semantics);
    # static ego + static plane => the tracked target IS the query pixel
    q = pk.queries_from_mask(sem.astype(np.float32))
    tracks = {
        g: dict(query=q, fwd=q, fwd_vis=np.ones(len(q), np.float32),
                bwd=q, bwd_vis=np.ones(len(q), np.float32))
        for g in range(n_imgs)
    }
    written = pk.package_scene_flow(dst, tracks=tracks, slide_window=1,
                                    split_mode="nvs-75")
    assert written, "packager produced no flow packages"


def run_script(script, args):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script)] + args,
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_full_pipeline_rehearsal(tmp_path):
    rng = np.random.default_rng(3)
    raw, scene = make_raw_kitti(str(tmp_path / "raw"), rng)
    dst_root = str(tmp_path / "scenes")

    # 1. offline conversion (numpy-only subprocess, no TPU claim)
    run_script("convert_kitti.py",
               [raw, dst_root, scene, "--first_frame", "0",
                "--last_frame", str(N_FRAMES - 1), "--use_color"])
    dst = os.path.join(dst_root, scene)
    assert os.path.exists(os.path.join(dst, "poses.npz"))
    assert os.path.exists(os.path.join(dst, "points3d-75.ply"))

    # 2. pseudo-labels + object tagging + static triangulation
    write_pseudo_labels(dst, rng)
    run_script("segment_pcd.py", [dst])
    out = run_script("triangulate.py", [dst, "--window", "4"])
    assert os.path.exists(os.path.join(dst, "colmap-75.ply")), out

    from adgs_tpu.data import ply as ply_lib
    xyz, _, _, _ = ply_lib.fetch_point_cloud(
        os.path.join(dst, "colmap-75.ply"))
    assert len(xyz) > 20, "triangulation found too few static points"
    # triangulated statics must sit near the true plane
    assert np.mean(np.abs(xyz[:, 2] - PLANE_Z) < 0.3) > 0.8
    _, _, _, obj = ply_lib.fetch_point_cloud(
        os.path.join(dst, "points3d-75.ply"))
    assert (obj > 0).any(), "segment_pcd tagged no object points"

    # 3. contract check
    run_script("validate_scene.py", [dst])

    # 4. train with densification forcing gaussian-capacity growth and an
    # instance-capacity autotune event, then save
    from adgs_tpu.data.readers import read_scene
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.trainer import Trainer

    sc = read_scene(dst)
    opt = OptimizationConfig(
        iterations=40, densification_interval=8, densify_from_iter=8,
        densify_until_iter=1000,
        densify_scene_grad_threshold=1e-8,   # clone aggressively
        densify_obj_grad_threshold=1e-8,
        opacity_reset_interval=10_000, lambda_flow=0.01, lambda_reg=0.0,
        lambda_sigma_reg=0.0,
        # boosted LRs: the smoke run must visibly converge in ~100
        # iterations, not the reference's 30k
        feature_lr=0.02, opacity_lr=0.1, scaling_lr=0.02, env_lr=0.02)
    out_dir = str(tmp_path / "model")
    tr = Trainer(sc, opt, out_dir, capacity=512, env_resolution=32,
                 capacity_quantum=512,
                 order_args=dict(xyz=[4, 2, 0, 2, 0, 0],
                                 rotation=[0, 0, 0, 0, 4, 2],
                                 shs=[0, 0, 0, 2, 0, 0],
                                 background=[0, 0, 0, 0, 0, 0]))
    n0 = int(tr.state.num_scene) + int(tr.state.num_obj)
    cap0 = tr.capacity
    psnr_before = _eval_psnr(tr)
    tr.train(iterations=40, save_iterations=[40], test_iterations=[])
    n1 = int(tr.state.num_scene) + int(tr.state.num_obj)
    assert n1 > n0, "densification never added gaussians"
    assert tr.capacity > cap0, "instance capacity never autotuned up"

    # 5. resume from the snapshot and keep training; PSNR keeps rising
    tr2 = Trainer(sc, opt, str(tmp_path / "model2"), capacity=tr.capacity,
                  env_resolution=32, capacity_quantum=512,
                  order_args=dict(xyz=[4, 2, 0, 2, 0, 0],
                                  rotation=[0, 0, 0, 0, 4, 2],
                                  shs=[0, 0, 0, 2, 0, 0],
                                  background=[0, 0, 0, 0, 0, 0]))
    tr2.resume(os.path.join(out_dir, "point_cloud", "iteration_40",
                            "train_state.npz"))
    assert int(tr2.state.num_scene) + int(tr2.state.num_obj) == n1
    tr2.train(iterations=80, save_iterations=[], test_iterations=[])
    psnr_after = _eval_psnr(tr2)
    assert psnr_after > psnr_before + 0.5, (
        f"PSNR did not rise: {psnr_before:.2f} -> {psnr_after:.2f}")


def _eval_psnr(tr):
    """PSNR through the same staged render path Trainer.evaluate uses
    (env-map sky compositing included)."""
    import jax.numpy as jnp
    from adgs_tpu import render as render_lib
    from adgs_tpu.ops.image import psnr
    fn = render_lib.make_staged_render_fn(
        tr.config, active_sh_degree=tr.active_sh_degree,
        backend=tr.backend, capacity=tr.capacity,
        max_per_tile=tr.max_per_tile, chunk=tr.chunk)
    frames = tr.scene.train_frames
    vals = []
    for i in range(min(2, len(frames))):
        cam, batch, _ = tr._get_frame("train", i)
        rays = tr._rays_for(cam, frames[i].cam_id)
        out = fn(cam, tr.params, tr.state, tr.env, rays)
        vals.append(float(psnr(jnp.clip(out["render"], 0, 1), batch.image)))
    return float(np.mean(vals))
