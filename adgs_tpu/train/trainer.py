"""Host-side training orchestration.

The counterpart of training() in train.py:32-167: camera-stack sampling,
flow-package selection, SH degree warmup, densification scheduling, opacity
resets, KNN refresh for the regularizers, logging, checkpoints — around the
jitted step of train/step.py (or the sharded variant).

TPU-specific additions: capacity growth with recompile when densification
runs out of dead slots, full-state snapshots for true resume, and JSONL
metrics (plus TensorBoard when torch is importable).
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import sys
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import gaussians as gm
from ..models.env_map import EnvironmentMap, camera_rays
from ..ops import knn
from ..ops.image import psnr
from ..data.readers import SceneData
from ..data.frames import load_frame, flow_package
from .. import render as render_lib
from .config import OptimizationConfig
from .optim import TrainableState, init_adam
from .step import make_train_step
from . import checkpoint as ckpt_lib
from . import densify as densify_lib


class MetricsLogger:
    """JSONL scalars + optional TensorBoard (train.py:183-189 analog)."""

    def __init__(self, model_path: str, use_tensorboard: bool = True):
        os.makedirs(model_path, exist_ok=True)
        self.f = open(os.path.join(model_path, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(model_path)
            except Exception:
                self.tb = None

    def scalars(self, step: int, values: dict, prefix: str = "train"):
        rec = {"step": step, "split": prefix}
        rec.update({k: float(v) for k, v in values.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in values.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def image(self, step: int, tag: str, img: np.ndarray):
        """img: [3, H, W] or [H, W] float in [0, 1] -> TensorBoard."""
        if self.tb is None:
            return
        if img.ndim == 2:
            img = np.repeat(img[None], 3, axis=0)
        self.tb.add_image(tag, np.clip(img, 0.0, 1.0), step)

    def flush(self):
        self.f.flush()
        if self.tb is not None:
            self.tb.flush()


class Trainer:
    def __init__(self, scene: SceneData, opt: OptimizationConfig,
                 model_path: str,
                 order_args: Optional[dict] = None,
                 sh_degree: int = 3,
                 env_resolution: int = 8192,
                 resolution: int = 1,
                 default_order_downsample_ratio: int = 3,
                 backend: str = "auto",
                 capacity: int = 1 << 18,
                 max_per_tile: int = 2048,
                 chunk: int = 32,
                 inv_depth: bool = True,
                 seed: int = 0,
                 capacity_quantum: int = 4096,
                 white_background: bool = False,
                 profile_dir: Optional[str] = None,
                 devices: int = 0,
                 primitive_exchange: bool = False,
                 exchange_capacity: int = 0,
                 batch_cameras: int = 1):
        self.scene = scene
        self.opt = opt
        self.model_path = model_path
        self.backend = backend
        self.capacity = capacity
        self.max_per_tile = max_per_tile
        self.chunk = chunk
        self.inv_depth = inv_depth
        self.white_background = white_background
        self.resolution = resolution
        self.capacity_quantum = capacity_quantum
        self.profile_dir = profile_dir
        # multi-device training (SURVEY §2.3 new TPU scope): devices > 1
        # builds a 1-D "tile" mesh and swaps in the sharded train step
        # (parallel/shard.py) — tile-row pixel sharding + 1/D primitive
        # sharding, with optional duplicateWithKeys-style routing
        self.devices = int(devices)
        self.primitive_exchange = primitive_exchange
        self.exchange_capacity = int(exchange_capacity)
        # batch_cameras B > 1 adds a "data" mesh axis: B cameras per step,
        # each data row on the production pallas path (2-D {data, tile}
        # mesh when devices > 1 too); needs B * max(devices, 1) chips
        self.batch_cameras = max(int(batch_cameras), 1)
        self.mesh = None
        if self.devices > 1 or self.batch_cameras > 1:
            from ..parallel.mesh import make_mesh
            shape = {}
            if self.batch_cameras > 1:
                shape["data"] = self.batch_cameras
            shape["tile"] = max(self.devices, 1)
            self.mesh = make_mesh(shape)
            tile_d = max(self.devices, 1)
            if capacity_quantum % tile_d:
                raise ValueError(
                    f"capacity_quantum {capacity_quantum} must divide by "
                    f"devices {tile_d} (1/D primitive sharding)")
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

        if order_args is None:
            order_args = dict(xyz=[None, 5, 0, 6, 0, 0],
                              rotation=[0, 0, 0, 0, None, 5],
                              shs=[0, 0, 0, 6, 0, 0],
                              background=[0, 0, 0, 0, 0, 0])
        frame_num = int(round(1.0 / scene.frame_gap))
        self.config = gm.GaussianConfig.from_order_args(
            order_args, frame_num, default_order_downsample_ratio,
            sh_degree=sh_degree, use_time_mask=opt.lambda_sigma > 0.0)

        d2 = knn.mean_knn_sq_dist(scene.points)
        params, state = gm.create_from_pcd(
            scene.points, scene.colors, scene.obj_id, scene.times,
            self.config, d2, capacity_quantum=capacity_quantum, seed=seed)
        params = gm.set_init_time_sigma(params, scene.frame_gap)
        self.env = EnvironmentMap.create(env_resolution, seed=seed)
        self.params, self.state = params, state
        self.opt_state = init_adam(TrainableState(self.params, self.env))

        self.use_near_idx = (opt.lambda_reg > 0.0
                             or (opt.lambda_sigma > 0.0
                                 and opt.lambda_sigma_reg > 0.0))
        self.cameras_extent = max(scene.cameras_extent, opt.min_camera_extent)
        self.logger = MetricsLogger(model_path)
        self._step_fn = None
        self._ray_cache: dict = {}
        self.active_sh_degree = 0
        self.iteration = 0

        # preload device-side frames lazily
        self._frame_cache: dict = {}

    # ------------------------------------------------------------------
    def _get_frame(self, split: str, idx: int):
        keyed = (split, idx)
        if keyed not in self._frame_cache:
            frames = (self.scene.train_frames if split == "train"
                      else self.scene.test_frames)
            self._frame_cache[keyed] = load_frame(frames[idx], self.resolution)
        return self._frame_cache[keyed]

    def _rays_for(self, cam, cam_id: int):
        if cam_id not in self._ray_cache:
            self._ray_cache[cam_id] = jnp.asarray(
                camera_rays(cam.focal_x, cam.height, cam.width),
                dtype=jnp.float32)
        return self._ray_cache[cam_id]

    def _frames_for_step(self, picks: list, opt):
        """Load the step's frame(s); stack them when batch_cameras > 1.

        Flow packages must give the batch a CONSISTENT pytree structure,
        so when any picked frame has flow supervision the others get a
        zero package gated off by flow_valid=False (the same scalar gate
        the loss already applies, losses.py flow_valid)."""
        frames = self.scene.train_frames
        loaded = [self._get_frame("train", i) for i in picks]
        want_flow = (opt.lambda_flow > 0.0
                     and any(fl for _, _, fl in loaded))
        cams, batches, rays_l = [], [], []
        for i, (cam, batch, flow_list) in zip(picks, loaded):
            if want_flow:
                if flow_list:
                    raw = flow_list[self.rng.randrange(len(flow_list))]
                    batch = batch._replace(flow=flow_package(raw),
                                           flow_valid=jnp.asarray(True))
                else:
                    from ..ops.flow import FlowPackage
                    H, W = batch.depth.shape
                    batch = batch._replace(
                        flow=FlowPackage(
                            time=jnp.asarray(cam.time, jnp.float32),
                            K=jnp.eye(3, dtype=jnp.float32),
                            R=jnp.eye(3, dtype=jnp.float32),
                            T=jnp.zeros(3, jnp.float32),
                            flow=jnp.zeros((2, H, W), jnp.float32),
                            vis=jnp.zeros((H, W), jnp.float32)),
                        flow_valid=jnp.asarray(False))
            cams.append(cam)
            batches.append(batch)
            rays_l.append(self._rays_for(cam, frames[i].cam_id))
        if self.batch_cameras == 1:
            return cams[0], batches[0], rays_l[0]
        from ..parallel.data_parallel import stack_batches, stack_cameras
        return stack_cameras(cams), stack_batches(batches), jnp.stack(rays_l)

    def _build_step(self):
        if self.mesh is not None:
            from ..parallel.shard import (make_sharded_train_step,
                                          default_exchange_capacity)
            tile_d = max(self.devices, 1)
            if not self.exchange_capacity:
                self.exchange_capacity = default_exchange_capacity(
                    self.params.capacity // tile_d, tile_d)
            self._step_fn = make_sharded_train_step(
                self.config, self.opt, self.scene.frame_gap,
                self.scene.scene_extent, self.scene.cameras_extent,
                mesh=self.mesh, backend=self.backend,
                capacity=self.capacity, max_per_tile=self.max_per_tile,
                chunk=self.chunk, inv_depth=self.inv_depth,
                primitive_exchange=self.primitive_exchange,
                exchange_capacity=self.exchange_capacity,
                data_axis="data" if self.batch_cameras > 1 else None)
            return
        self._step_fn = make_train_step(
            self.config, self.opt, self.scene.frame_gap,
            self.scene.scene_extent, self.scene.cameras_extent,
            backend=self.backend, capacity=self.capacity,
            max_per_tile=self.max_per_tile, chunk=self.chunk,
            inv_depth=self.inv_depth)

    def refresh_near_idx(self):
        """set_obj_near_idx (gaussian_model.py:825-833): random anchors,
        KNN in xyz (+ time * scene_extent when time-masked).

        Default path is the fully-compiled Morton-window device KNN
        (ops/knn.near_idx_device) — no device pull, no host cKDTree in the
        densification cadence. ADGS_KNN_HOST=1 restores the exact host
        path (scipy) as a fallback."""
        if not self.use_near_idx:
            return
        K = self.opt.near_num
        a_cap = max(1, self.params.obj_capacity // K)
        if not int(os.environ.get("ADGS_KNN_HOST", "0")):
            self.key, sub = jax.random.split(self.key)
            pts = self.params.obj_xyz
            if self.config.use_time_mask:
                pts = jnp.concatenate(
                    [pts, self.state.gs_time[:, None]
                     * self.scene.scene_extent], axis=1)
            idx, valid = knn.near_idx_device(
                pts, self.state.obj_alive, sub, K, a_cap)
            self.state = dataclasses.replace(
                self.state, obj_near_idx=idx, obj_near_valid=valid)
            return
        oa = np.asarray(self.state.obj_alive)
        idx_alive = np.nonzero(oa)[0]
        if len(idx_alive) < K:
            return
        pts = np.asarray(self.params.obj_xyz)[idx_alive]
        if self.config.use_time_mask:
            t = np.asarray(self.state.gs_time)[idx_alive]
            pts = np.concatenate(
                [pts, t[:, None] * self.scene.scene_extent], axis=1)
        n_anchor = max(1, len(idx_alive) // K)
        perm = self.np_rng.permutation(len(idx_alive))[:n_anchor]
        nn = knn.knn_indices(pts[perm], pts, k=K)
        # map back to padded slot indices; pad anchors to a stable shape
        idx = idx_alive[nn].astype(np.int32)
        out = np.zeros((a_cap, K), np.int32)
        valid = np.zeros(a_cap, bool)
        n = min(a_cap, idx.shape[0])
        out[:n] = idx[:n]
        valid[:n] = True
        self.state = dataclasses.replace(
            self.state, obj_near_idx=jnp.asarray(out),
            obj_near_valid=jnp.asarray(valid))

    def _grow_exchange_capacity(self):
        """The primitive-exchange all-to-all dropped rows (shard.py
        exchange_overflow): grow the per-pair capacity 1.5x and rebuild the
        sharded step — the same overflow-driven autotune pattern as the
        instance capacity."""
        self.exchange_capacity = -(-int(self.exchange_capacity * 1.5) // 8) * 8
        print(f"[autotune] exchange_capacity -> {self.exchange_capacity}",
              file=sys.stderr)
        self._step_fn = None
        self._build_step()

    def _maybe_grow_instance_capacity(self, num_rendered: int):
        """Overflow-driven autotuning of the duplicated-instance capacity
        (the reference sizes this buffer exactly per frame,
        rasterizer_impl.cu:284-305; our static shape grows on demand with
        one retrace). Headroom 1/0.92 with a 0.97 trigger: every
        integer-pipeline stage (expansion, sort, instance gather, grad
        permute) scales with this static shape — measured ~18 us/it per 1%
        of headroom (exp/lab_cap.py: nr/0.95 sizing is -5.0 ms/it vs
        nr/0.80 with identical outputs) — and the tighter margin is safe
        because run() also checks num_rendered against the capacity EVERY
        step and grows immediately on overflow (truncation is never
        silent; a handful of extra retraces replace ~260 s of
        integer-pipeline slack over a 60k run)."""
        if num_rendered <= 0.97 * self.capacity:
            return
        q = 4096
        new_cap = -(-int(num_rendered / 0.92) // q) * q
        if new_cap <= self.capacity:
            return
        self.capacity = new_cap
        self._step_fn = None
        self._build_step()
        # eval render fns bake the old capacity — drop them
        for k in [k for k in self._frame_cache if k and k[0] == "eval"]:
            del self._frame_cache[k]
        print(f"[capacity] instance capacity grew to {new_cap}")

    def _maybe_grow_capacity(self):
        ns = int(self.state.num_scene)
        no = int(self.state.num_obj)
        Ns = self.params.scene_capacity
        No = self.params.obj_capacity
        grow_s = Ns if ns > 0.9 * Ns else 0
        grow_o = No if no > 0.9 * No else 0
        if grow_s or grow_o:
            t, self.opt_state, self.state = densify_lib.grow_capacity(
                TrainableState(self.params, self.env), self.opt_state,
                self.state, Ns + grow_s, No + grow_o)
            self.params, self.env = t.gaussians, t.env
            print(f"[capacity] grew to scene={Ns + grow_s} obj={No + grow_o}")

    def _dump_failure_snapshot(self, it: int, fidx: int) -> str:
        """Repro capsule on step failure (the TPU analog of the
        reference's snapshot_fw/bw.dump): the full train state + the
        failing frame index, loadable via checkpoint.load_state to replay
        the exact step — e.g. in interpret mode to localize a Mosaic
        miscompile, the remote-TPU equivalent of a CUDA kernel fault."""
        path = os.path.join(self.model_path, f"snapshot_fail_{it}.npz")
        try:
            ckpt_lib.save_state(
                path, TrainableState(self.params, self.env),
                self.opt_state, self.state, it,
                extras={"failed_frame_idx": fidx,
                        "active_sh_degree": self.active_sh_degree,
                        "instance_capacity": self.capacity})
        except Exception as dump_err:  # noqa: BLE001
            return f"<dump failed: {dump_err}>"
        return path

    # ------------------------------------------------------------------
    def train(self, iterations: Optional[int] = None,
              save_iterations: Optional[list] = None,
              test_iterations: Optional[list] = None,
              log_every: int = 10):
        opt = self.opt
        iterations = iterations or opt.iterations
        save_iterations = set(save_iterations or [iterations])
        test_iterations = set(test_iterations or [iterations])
        if self._step_fn is None:
            self._build_step()
        self.refresh_near_idx()

        from ..profiling import StepTimer, trace
        timer = StepTimer()
        # --profile: trace a short steady-state window (steps 20-40) so the
        # dump stays small enough for TensorBoard's profile plugin
        prof_window = (range(20, 40) if self.profile_dir else range(0))
        prof_ctx = None

        stack: list = []
        ema = 0.0
        t_start = time.time()
        for it in range(self.iteration + 1, iterations + 1):
            self.iteration = it
            if self.profile_dir and it == prof_window.start:
                prof_ctx = trace(self.profile_dir)
                prof_ctx.__enter__()
            if prof_ctx is not None and it == prof_window.stop:
                prof_ctx.__exit__(None, None, None)
                prof_ctx = None
                print(f"[profile] trace written to {self.profile_dir}")
            if it % 1000 == 0 and self.active_sh_degree < self.config.sh_degree:
                self.active_sh_degree += 1

            picks = []
            for _ in range(self.batch_cameras):
                if not stack:
                    stack = list(range(len(self.scene.train_frames)))
                    if opt.data_sample == "stack":
                        self.rng.shuffle(stack)
                picks.append(stack.pop(0 if opt.data_sample == "order"
                                       else self.rng.randrange(len(stack))))
            fidx = picks[0]
            cam, batch, rays = self._frames_for_step(picks, opt)

            try:
                with timer:
                    (self.params, self.env, self.opt_state, self.state,
                     logs) = self._step_fn(
                        self.params, self.env, self.opt_state, self.state,
                        cam, batch, rays, jnp.float32(it),
                        active_sh_degree=self.active_sh_degree)
                    loss = float(logs["total_loss"])  # blocks on the step
            except Exception:
                # repro capsule, the analog of the reference's
                # snapshot_fw/bw.dump on kernel failure
                # (diff_gaussian_rasterization/__init__.py:92-99): the full
                # optimizer state plus the failing frame index, replayable
                # via checkpoint.load_state + Trainer.
                path = self._dump_failure_snapshot(it, fidx)
                print(f"[debug] step {it} raised; repro state dumped to "
                      f"{path} (frame {fidx})", file=sys.stderr)
                raise
            ema = 0.4 * loss + 0.6 * ema if it > 1 else loss
            if it % log_every == 0:
                self.logger.scalars(
                    it, dict(logs, steps_per_sec=timer.steps_per_sec))
            # per-step overflow guard: with the tight 0.92 sizing a frame
            # whose num_rendered exceeds the static capacity must grow NOW
            # (that step truncated its tile lists), not at the next
            # periodic check
            if (int(logs["num_rendered"]) > self.capacity
                    or it % self.opt.densification_interval == 0):
                self._maybe_grow_instance_capacity(
                    int(logs["num_rendered"]))
            if it % self.opt.densification_interval == 0:
                if (self.mesh is not None
                        and bool(logs.get("exchange_overflow", False))):
                    self._grow_exchange_capacity()
            if it % 200 == 0:
                n = int(self.state.num_scene) + int(self.state.num_obj)
                print(f"[{it}/{iterations}] loss={ema:.5f} pts={n} "
                      f"({(time.time() - t_start):.0f}s)")

            # densification (train.py:148-160)
            if it < opt.densify_until_iter:
                if (it > opt.densify_from_iter
                        and it % opt.densification_interval == 0):
                    self.key, sub = jax.random.split(self.key)
                    t, self.opt_state, self.state, rep = \
                        densify_lib.densify_and_prune(
                            TrainableState(self.params, self.env),
                            self.opt_state, self.state, sub,
                            opt.densify_scene_grad_threshold,
                            opt.densify_obj_grad_threshold,
                            opt.min_opacity,
                            jnp.asarray(it > opt.opacity_reset_interval),
                            self.scene.scene_extent, opt.object_extent,
                            opt.percent_dense)
                    self.params, self.env = t.gaussians, t.env
                    self._maybe_grow_capacity()
                    self.refresh_near_idx()
                elif (self.use_near_idx
                      and it % opt.near_idx_reset_interval == 0):
                    self.refresh_near_idx()
                if (it % opt.opacity_reset_interval == 0
                        or (self.white_background
                            and it == opt.densify_from_iter)):
                    # white-background scenes also reset once at the start
                    # of densification (train.py:158-160)
                    t, self.opt_state = densify_lib.reset_opacity(
                        TrainableState(self.params, self.env), self.opt_state)
                    self.params, self.env = t.gaussians, t.env

            if it in test_iterations:
                self.evaluate(it)
            if it in save_iterations:
                self.save(it)
        if prof_ctx is not None:
            prof_ctx.__exit__(None, None, None)
        self.logger.flush()

    # ------------------------------------------------------------------
    def evaluate(self, it: int, max_frames: int = 10, max_panels: int = 3):
        """training_report analog (train.py:187-274): PSNR/SSIM (+LPIPS
        when weights exist) over the test split + 5 fixed train cameras,
        and per-frame image panels (render/gt/error/depth/opacity/
        foreground/background/objmask) to TensorBoard."""
        from ..ops.image import ssim as ssim_fn
        from ..ops.lpips import lpips_fn
        key = ("eval", self.active_sh_degree)
        if key not in self._frame_cache:
            self._frame_cache[key] = render_lib.make_staged_render_fn(
                self.config, active_sh_degree=self.active_sh_degree,
                inv_depth=self.inv_depth, backend=self.backend,
                capacity=self.capacity, max_per_tile=self.max_per_tile,
                chunk=self.chunk)
        render_fn = self._frame_cache[key]
        lp_vgg = lpips_fn("vgg")
        # test split + 5 fixed train cameras (training_report,
        # train.py:195-199)
        configs = [("test", range(min(max_frames,
                                      len(self.scene.test_frames))))]
        if self.scene.train_frames:
            n_tr = len(self.scene.train_frames)
            configs.append(("train", [i % n_tr for i in range(5, 30, 5)]))
        for split, idxs in configs:
            frames = (self.scene.test_frames if split == "test"
                      else self.scene.train_frames)
            vals: dict = {"psnr": [], "ssim": [], "lpips": []}
            for j, i in enumerate(idxs):
                cam, batch, _ = self._get_frame(split, i)
                rays = self._rays_for(cam, frames[i].cam_id)
                out = render_fn(cam, self.params, self.state, self.env, rays)
                img = jnp.clip(out["render"], 0, 1)
                vals["psnr"].append(float(psnr(img, batch.image)))
                vals["ssim"].append(float(ssim_fn(img, batch.image)))
                if lp_vgg is not None:
                    vals["lpips"].append(float(lp_vgg(img, batch.image)))
                if j < max_panels:
                    self._log_panels(it, f"{split}_view_{i}", out, img,
                                     batch)
            if vals["psnr"]:
                scalars = {"psnr": np.mean(vals["psnr"]),
                           "ssim": np.mean(vals["ssim"])}
                if vals["lpips"]:
                    scalars["lpips_vgg"] = np.mean(vals["lpips"])
                print(f"[ITER {it}] {split} "
                      + " ".join(f"{k.upper()} {v:.3f}"
                                 for k, v in scalars.items()))
                self.logger.scalars(it, scalars, prefix=split)

    def _log_panels(self, it: int, tag: str, out: dict, img, batch):
        """Image panels at test iterations (train.py:236-251)."""
        np_img = np.asarray(img)
        self.logger.image(it, f"{tag}/render", np_img)
        self.logger.image(it, f"{tag}/ground_truth",
                          np.asarray(batch.image))
        self.logger.image(it, f"{tag}/error",
                          np.abs(np_img - np.asarray(batch.image)))
        depth = np.asarray(out["depth"])
        dmax = depth.max()
        self.logger.image(it, f"{tag}/depth",
                          depth / dmax if dmax > 0 else depth)
        self.logger.image(it, f"{tag}/opacity",
                          np.asarray(out["img_opacity"]))
        self.logger.image(it, f"{tag}/foreground",
                          np.asarray(out["foreground"]))
        self.logger.image(it, f"{tag}/background",
                          np.asarray(out["background"]))
        if out.get("img_semantic") is not None:
            self.logger.image(it, f"{tag}/objmask",
                              np.asarray(out["img_semantic"])[0])

    def resume(self, path: str):
        """True mid-training resume from a train_state.npz snapshot (the
        reference can only restore weights for rendering — SURVEY.md §5)."""
        tr, self.opt_state, self.state, it = ckpt_lib.load_state(
            path, TrainableState(self.params, self.env), self.opt_state,
            self.state)
        self.params, self.env = tr.gaussians, tr.env
        self.iteration = it
        self.active_sh_degree = min(it // 1000, self.config.sh_degree)
        print(f"[resume] restored iteration {it}")

    def save(self, it: int):
        base = os.path.join(self.model_path, "point_cloud",
                            f"iteration_{it}")
        ckpt_lib.save_ply(os.path.join(base, "point_cloud.ply"),
                          self.params, self.state, self.config)
        np.save(os.path.join(base, "env.npy"), np.asarray(self.env.grid))
        ckpt_lib.save_state(
            os.path.join(base, "train_state.npz"),
            TrainableState(self.params, self.env), self.opt_state,
            self.state, it)
        print(f"[ITER {it}] saved to {base}")
