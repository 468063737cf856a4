"""Benchmark: fwd+bwd rasterization throughput (pixels/s/chip).

Protocol (BASELINE.md north star): differentiable render of a KITTI-shaped
frame (1242x375) from ~1M Gaussians, full gradient w.r.t. all Gaussian
parameters, steady-state over repeated steps on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against an A100 fwd+bwd reference throughput of
7.1e7 pixels/s (typical diff-gaussian-rasterization training-iteration
rate at ~1M splats on A100: ~150 fwd+bwd renders/s at 0.47 MPix — the
reference repo publishes no numbers, BASELINE.md, so this is the working
constant; >1.0 means faster than that baseline).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

A100_BASELINE_PIX_S = 7.1e7

N_GAUSS = int(os.environ.get("BENCH_N_GAUSS", 1_000_000))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1242))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 375))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
BACKEND = os.environ.get("BENCH_BACKEND", "pallas")
# 0 = size the instance capacity the way the trainer's overflow autotuner
# would — every integer-pipeline stage scales with this static shape, so
# benching at a fixed oversized capacity understates the trained-system
# throughput. Headroom follows the trainer's shipped 0.92 policy since
# round 5 (trainer.py _maybe_grow_instance_capacity; rounds <= 4 benched
# at 0.8 — worth ~+4-5 ms/it at 1M, exp/lab_cap.py, so cross-round
# comparisons should add that back or set BENCH_CAP_HEADROOM=0.8)
CAPACITY = int(os.environ.get("BENCH_CAPACITY", 0))
CAP_HEADROOM = float(os.environ.get("BENCH_CAP_HEADROOM", 0.92))
MAX_PER_TILE = int(os.environ.get("BENCH_MAX_PER_TILE", 4096))
CHUNK = int(os.environ.get("BENCH_CHUNK", 64))
# second phase: the trainer-shaped step (deform, flow+semantic channels,
# full loss assembly, Adam) — the end-to-end number that matters for
# training, and the only place the 8-channel Pallas layout runs COMPILED
# on real TPU (round-1 gap: flow/semantic channels only ever interpreted)
BENCH_TRAIN = int(os.environ.get("BENCH_TRAIN", 1))
TRAIN_N_GAUSS = int(os.environ.get("BENCH_TRAIN_N_GAUSS", N_GAUSS))
# compiled-path parity: interpret-mode pytest cannot catch Mosaic/XLA
# compiled miscompiles (the f32->bf16 matmul truncation bug, commit
# 70a5031, passed every CPU test). Every bench run therefore renders one
# deterministic scene via the Pallas kernels AND the XLA tiled tier ON
# CHIP and asserts image + probe-gradient parity before timing anything.
BENCH_PARITY = int(os.environ.get("BENCH_PARITY", 1))


BENCH_TIMEOUT = int(os.environ.get("BENCH_TIMEOUT", 2400))


def wait_for_tpu(max_wait_s=None):
    """Probe axon TPU bring-up in fresh SUBPROCESSES with bounded backoff.

    A failed in-process bring-up is cached by jax's xla_bridge for the life
    of the interpreter, so retrying must happen in a child process. The
    tunnel fails transiently for minutes (VERDICT r3 weak #2: one bad window
    erased the round-3 perf record), and a killed TPU holder leaves a stale
    claim that clears in ~tens of seconds — both are exactly the
    retry-with-backoff shape.

    Returns None once a probe succeeds (the claim is released on probe
    exit; the caller can then bring the backend up in-process), or a
    diagnosis dict after max_wait_s of failures.
    """
    import subprocess
    if max_wait_s is None:
        max_wait_s = int(os.environ.get("BENCH_TPU_WAIT", 600))
    probe_src = ("import jax\n"
                 "jax.config.update('jax_platforms', 'axon')\n"
                 "d = jax.devices()\n"
                 "print('TPU_OK', d[0].device_kind)\n")
    deadline = time.time() + max_wait_s
    attempt, last_err = 0, ""
    while True:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", probe_src],
                               capture_output=True, text=True, timeout=240)
            if r.returncode == 0 and "TPU_OK" in r.stdout:
                print(f"# TPU up (attempt {attempt}, "
                      f"{time.time() - t0:.0f}s)", file=sys.stderr)
                return None
            tail = (r.stderr or r.stdout).strip().splitlines()
            last_err = tail[-1][:300] if tail else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last_err = "bring-up probe timed out (240s)"
        remaining = deadline - time.time()
        print(f"# TPU probe attempt {attempt} failed: {last_err} "
              f"({remaining:.0f}s left)", file=sys.stderr)
        if remaining <= 0:
            return {"attempts": attempt, "last_error": last_err}
        time.sleep(min(45.0, 5.0 * attempt, max(remaining, 1.0)))


def bench_train_step():
    """Full train-step it/s: spline deformation, 8-channel render
    (rgb+depth+flow+objmask), loss assembly, Adam, densify stats."""
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from adgs_tpu.ops.flow import FlowPackage
    from adgs_tpu.train.config import OptimizationConfig
    from adgs_tpu.train.losses import FrameBatch
    from adgs_tpu.train.optim import TrainableState, init_adam
    from adgs_tpu.train.step import make_train_step

    import dataclasses as _dc
    from adgs_tpu.render import compute_binning

    params, state, cfg, cam, env, rays = ge._build_scene(
        n_points=TRAIN_N_GAUSS, width=WIDTH, height=HEIGHT,
        quantum=max(4096, TRAIN_N_GAUSS // 64))
    # the synthetic point cloud is blobbier than a trained scene (~6 tiles
    # per gaussian vs ~1.4 on converged KITTI); shrink scales toward the
    # raster protocol's density, then size the instance capacity the way
    # the trainer's overflow autotuner would — overflow would silently
    # truncate instances and flatter the number
    _shr = float(np.log(0.3))
    params = _dc.replace(params, scene_scaling=params.scene_scaling + _shr,
                         obj_scaling=params.obj_scaling + _shr)
    nr = int(jax.jit(
        lambda p, s: compute_binning(cam, p, s, cfg, active_sh_degree=3,
                                     capacity=1 << 10).num_rendered
    )(params, state))
    cap_train = -(-int(nr / CAP_HEADROOM) // 4096) * 4096
    wok = jax.jit(
        lambda p, s: compute_binning(cam, p, s, cfg, active_sh_degree=3,
                                     capacity=cap_train).window_ok
    )(params, state)
    print(f"# train scene: num_rendered {nr}, capacity {cap_train}, "
          f"expansion window_ok={bool(wok)}", file=sys.stderr)
    opt = OptimizationConfig()
    step = make_train_step(
        cfg, opt, frame_gap=1.0 / 60, scene_extent=20.0,
        cameras_extent=10.0, capacity=cap_train,
        max_per_tile=MAX_PER_TILE, chunk=CHUNK, backend=BACKEND)
    rng = np.random.default_rng(1)
    fx = 0.5 * WIDTH / np.tan(0.6)
    K = np.array([[fx, 0, WIDTH / 2], [0, fx, HEIGHT / 2], [0, 0, 1]],
                 np.float32)
    batch = FrameBatch(
        image=jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)),
                          dtype=jnp.float32),
        depth=jnp.ones((HEIGHT, WIDTH), jnp.float32),
        sky=jnp.zeros((HEIGHT, WIDTH), jnp.float32),
        semantic=jnp.asarray(rng.random((HEIGHT, WIDTH)) < 0.3,
                             dtype=jnp.float32),
        flow=FlowPackage(
            time=jnp.float32(0.35), K=jnp.asarray(K),
            R=jnp.eye(3, dtype=jnp.float32),
            T=jnp.zeros(3, jnp.float32),
            flow=jnp.asarray(rng.uniform(size=(2, HEIGHT, WIDTH)),
                             dtype=jnp.float32) * WIDTH,
            vis=jnp.ones((HEIGHT, WIDTH), jnp.float32)),
        flow_valid=jnp.asarray(True))
    opt_state = init_adam(TrainableState(gaussians=params, env=env))

    out = step(params, env, opt_state, state, cam, batch, rays,
               jnp.float32(1000), active_sh_degree=3)
    jax.block_until_ready(out)
    iters = max(ITERS // 2, 3)
    # thread the train state through the loop (true steady-state training,
    # and a data dependency that defeats the axon tunnel's dispatch-queue
    # overlap, which otherwise reports enqueue time for independent calls)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, env, opt_state, state = out[:4]
        out = step(params, env, opt_state, state, cam, batch, rays,
                   jnp.float32(1000), active_sh_degree=3)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    loss = float(out[-1]["total_loss"])
    assert np.isfinite(loss), f"train bench loss not finite: {loss}"

    # production-shaped variant: KNN regularizer GROUPS ACTIVE. Every
    # reference preset trains with lambda_reg=0.5 (+ sigma regs), but the
    # synthetic state's [1,1] near_idx makes those terms trivially cheap
    # above — this number is the honest converged-scene step rate
    # (obj_capacity/K anchor groups, the trainer's refresh shape).
    # Failure-isolated: a fault here must never erase the numbers above.
    try:
        import dataclasses as _dc3
        from adgs_tpu.ops import knn as knn_lib
        k_nn = opt.near_num
        a_cap = max(1, params.obj_capacity // k_nn)
        idxg, validg = knn_lib.near_idx_device(
            params.obj_xyz, state.obj_alive, jax.random.PRNGKey(7), k_nn,
            a_cap)
        state_reg = _dc3.replace(state, obj_near_idx=idxg,
                                 obj_near_valid=validg)
        out = step(params, env, opt_state, state_reg, cam, batch, rays,
                   jnp.float32(1000), active_sh_degree=3)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, env, opt_state, state_reg = out[:4]
            out = step(params, env, opt_state, state_reg, cam, batch,
                       rays, jnp.float32(1000), active_sh_degree=3)
        jax.block_until_ready(out)
        dt_reg = time.perf_counter() - t0
        loss_reg = float(out[-1]["total_loss"])
        assert np.isfinite(loss_reg), f"reg loss not finite: {loss_reg}"
        reg_its = iters / dt_reg
    except Exception as e:  # noqa: BLE001 — report, don't erase
        print(f"# reg-variant train step FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)
        reg_its, loss_reg = None, float("nan")
    return iters / dt, loss, reg_its, loss_reg


def _bench_body(result):
    """Fills `result` in place, advancing result['phase'] as stages land —
    so a mid-run failure still reports every number measured before it."""
    import jax
    # persistent compile cache: the staged jits at bench scale cost minutes
    # to compile on the remote-TPU path the first time, seconds after
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if BENCH_PARITY:
        result["phase"] = "compiled_parity"
        from scripts.compiled_parity import compiled_parity_check
        compiled_parity_check()
    result["phase"] = "raster_setup"
    import jax.numpy as jnp
    from adgs_tpu.core.camera import Camera
    from adgs_tpu.raster.api import rasterize
    from adgs_tpu.render import settings_for_camera

    rng = np.random.default_rng(0)
    # Gaussian cloud filling the frustum, scales sized for a driving scene
    pts = np.zeros((N_GAUSS, 3), dtype=np.float32)
    pts[:, 2] = rng.uniform(2.0, 80.0, N_GAUSS)
    fovx, fovy = 1.2, 0.42
    pts[:, 0] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovx / 2) * 2
    pts[:, 1] = rng.uniform(-0.75, 0.75, N_GAUSS) * pts[:, 2] * np.tan(fovy / 2) * 2
    K = 16
    shs = np.zeros((N_GAUSS, K, 3), dtype=np.float32)
    shs[:, 0] = rng.uniform(-1, 1, (N_GAUSS, 3))
    shs[:, 1:] = rng.normal(size=(N_GAUSS, K - 1, 3)) * 0.05
    scales = np.exp(rng.normal(size=(N_GAUSS, 3)) * 0.4 - 3.2) * pts[:, 2:3] * 0.05
    quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, N_GAUSS).astype(np.float32)

    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=fovx, fovy=fovy,
                        width=WIDTH, height=HEIGHT)
    settings = settings_for_camera(cam, sh_degree=3)

    params = dict(
        means3d=jnp.asarray(pts),
        shs=jnp.asarray(shs),
        scales=jnp.asarray(scales, dtype=jnp.float32),
        rotations=jnp.asarray(quats),
        opacities=jnp.asarray(opac),
    )
    target = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)),
                         dtype=jnp.float32)

    global CAPACITY
    if CAPACITY == 0:
        # probe the true instance count once, then size capacity with the
        # trainer autotuner's headroom policy (train/trainer.py
        # _maybe_grow_instance_capacity)
        from adgs_tpu.raster import preprocess as _prep
        from adgs_tpu.raster import binning as _binning

        @jax.jit
        def _probe(p):
            prep = _prep.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                None, settings)
            return jnp.sum(prep.tiles_touched)
        nr = int(_probe(params))
        CAPACITY = -(-int(nr / CAP_HEADROOM) // 4096) * 4096
        print(f"# instance capacity autotuned to {CAPACITY} "
              f"(num_rendered {nr})", file=sys.stderr)

    if BACKEND == "pallas":
        # Staged execution: binning (integer sort pipeline, no gradients)
        # compiles separately from the differentiable render step — same
        # structure the trainer uses, and it keeps XLA/Mosaic compile time
        # bounded. The preprocess runs twice (once for binning geometry,
        # once inside the grad step); it is ~6% of the iteration.
        from adgs_tpu.raster import preprocess as prep_lib
        from adgs_tpu.raster import binning as binning_lib
        from adgs_tpu.raster import composite as cmod
        from adgs_tpu.raster.pallas import render as pal
        from adgs_tpu.raster.tiled import tiles_to_image

        @jax.jit
        def bin_step(p):
            # geometry only — binning never reads SH colors
            prep = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                None, settings)
            return binning_lib.bin_gaussians(prep, settings,
                                             capacity=CAPACITY,
                                             expander="auto")

        def loss_fn(p, b):
            prep = prep_lib.preprocess(
                p["means3d"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], settings)
            out = pal.render_pallas(prep, b, settings)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))

        grad_step = jax.jit(jax.value_and_grad(loss_fn))

        def step(p):
            b = bin_step(p)
            return grad_step(p, b)

        wok = bin_step(params).window_ok
        print(f"# pallas expansion window_ok={bool(wok)} "
              f"(False = live-compacted expansion, ~4-5 ms/it slower)",
              file=sys.stderr)
    else:
        def loss_fn(p):
            out = rasterize(means3d=p["means3d"], opacities=p["opacities"],
                            scales=p["scales"], rotations=p["rotations"],
                            settings=settings, shs=p["shs"], backend=BACKEND,
                            capacity=CAPACITY, max_per_tile=MAX_PER_TILE,
                            chunk=CHUNK)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))
        step = jax.jit(jax.value_and_grad(loss_fn))

    # warmup / compile
    result["phase"] = "raster_compile"
    loss, grads = step(params)
    jax.block_until_ready((loss, grads))

    result["phase"] = "raster_bench"
    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss, grads = step(params)
    jax.block_until_ready((loss, grads))
    dt = time.perf_counter() - t0

    pix_per_s = WIDTH * HEIGHT * ITERS / dt
    result.update(
        value=round(pix_per_s, 1),
        vs_baseline=round(pix_per_s / A100_BASELINE_PIX_S, 4),
    )
    print(f"# {N_GAUSS} gaussians, {WIDTH}x{HEIGHT}, {ITERS} iters in "
          f"{dt:.3f}s ({ITERS/dt:.2f} it/s), backend={BACKEND}, "
          f"loss={float(loss):.5f}", file=sys.stderr)
    if BENCH_TRAIN:
        result["phase"] = "train_bench"
        train_it_s, train_loss, reg_it_s, reg_loss = bench_train_step()
        result["train_step_it_per_sec"] = round(train_it_s, 3)
        result["train_step_pixels_per_sec"] = round(
            train_it_s * WIDTH * HEIGHT, 1)
        if reg_it_s is not None:
            result["train_reg_it_per_sec"] = round(reg_it_s, 3)
        print(f"# train-shaped step: {train_it_s:.2f} it/s at "
              f"{TRAIN_N_GAUSS} gaussians, loss={train_loss:.5f}; "
              f"with active KNN-reg groups: "
              f"{'%.2f it/s' % reg_it_s if reg_it_s else 'FAILED'} "
              f"(loss={reg_loss:.5f})",
              file=sys.stderr)
    result["phase"] = "done"


def main():
    """Never lose a round's perf record (VERDICT r3 weak #2): bounded
    bring-up retries, a watchdog on the whole run, and one JSON line on
    stdout in EVERY outcome — a number, partial numbers + a structured
    error, or a bring-up diagnosis. Exit code is always 0 so the recorded
    artifact is the JSON, not a stack trace."""
    import threading
    import traceback

    result = {
        "metric": "fwd_bwd_pixels_per_sec_per_chip",
        "value": None,
        "unit": "pixels/s",
        "vs_baseline": None,
        "phase": "tpu_bringup",
    }

    def finish():
        if result.get("phase") == "done":
            del result["phase"]
        print(json.dumps(result))
        sys.stdout.flush()

    if os.environ.get("BENCH_SKIP_TPU_WAIT", "0") != "1":
        diag = wait_for_tpu()
        if diag is not None:
            result["error"] = f"TPU bring-up failed: {diag['last_error']}"
            result["bringup_attempts"] = diag["attempts"]
            finish()
            return

    def worker():
        try:
            _bench_body(result)
        except BaseException as e:  # noqa: BLE001 — diagnosis, not control
            traceback.print_exc(file=sys.stderr)
            result["error"] = f"{type(e).__name__}: {e}"[:600]

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    th.join(timeout=BENCH_TIMEOUT)
    if th.is_alive():
        result["error"] = (f"watchdog: bench hung >{BENCH_TIMEOUT}s in phase "
                           f"{result.get('phase')}")
        finish()
        os._exit(0)  # the worker is stuck in native code; don't wait on it
    finish()


if __name__ == "__main__":
    main()
