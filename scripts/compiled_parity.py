"""Compiled-path parity gate, standalone (VERDICT r3 weak #5).

Interpret-mode pytest cannot catch Mosaic/XLA compiled miscompiles — the
f32->bf16 matmul-truncation class of bug (commit 70a5031) passed every CPU
test while corrupting on-chip renders. This script renders one deterministic
scene through the Pallas kernels AND the XLA tiled tier COMPILED on the real
chip and asserts image + probe-gradient parity, plus the env-map blocked
sampler vs the generic gather path (including an azimuth-seam frame).

Runs in ~60-90 s on a warm tunnel (two small jit compiles). Exit code 0 and
a single JSON line on stdout either way:

    {"parity": "ok"} or {"parity": "fail", "error": ..., "phase": ...}

so a driver/CI can gate on the JSON rather than parse a stack trace.
Reference bar: the pairwise-tier assertions of tests/test_raster.py and
tests/test_grid_sample.py, but compiled instead of interpreted.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def compiled_parity_check():
    """Pallas-vs-XLA parity compiled on the real chip (raster + env map)."""
    import jax
    import jax.numpy as jnp
    from adgs_tpu.core.camera import Camera
    from adgs_tpu.raster.api import rasterize
    from adgs_tpu.render import settings_for_camera

    rng = np.random.default_rng(42)
    n = 3000
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, 2] = rng.uniform(2.0, 30.0, n)
    pts[:, 0] = rng.uniform(-0.6, 0.6, n) * pts[:, 2]
    pts[:, 1] = rng.uniform(-0.25, 0.25, n) * pts[:, 2]
    shs = rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.2
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.2).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, n).astype(np.float32)
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=1.2, fovy=0.6,
                        width=256, height=128)
    settings = settings_for_camera(cam, sh_degree=3)
    args = dict(means3d=jnp.asarray(pts), shs=jnp.asarray(shs),
                scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
                opacities=jnp.asarray(opac), settings=settings,
                capacity=1 << 15, max_per_tile=2048)
    probe = jnp.asarray(rng.normal(size=(3, 128, 256)).astype(np.float32))

    def run(backend):
        def loss(p):
            out = rasterize(backend=backend, **dict(args, means3d=p))
            return jnp.sum(out.color * probe), out.color
        (val, img), grad = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(args["means3d"])
        return np.asarray(img), np.asarray(grad)

    img_p, grad_p = run("pallas")
    img_x, grad_x = run("xla")

    def assert_parity(a, b, what, outlier_bound):
        """Miscompile-discriminating compare: the two tiers legitimately
        differ by isolated alpha-GATE flips (an ulp of separately-compiled
        preprocess rounding moves alpha across the 1/255 gate, changing
        that pixel by up to ~alpha_min) — sparse, bounded outliers. A real
        miscompile (e.g. the bf16 truncation bug, commit 70a5031) shifts
        the WHOLE field by ~1e-3 relative. So: tiny mean error, rare and
        bounded outliers."""
        scale = max(float(np.abs(b).max()), 1e-3)
        d = np.abs(a - b) / scale
        mean_d = float(d.mean())
        frac_big = float((d > 1e-3).mean())
        max_d = float(d.max())
        print(f"# parity {what}: mean {mean_d:.2e} frac>1e-3 "
              f"{frac_big:.2e} max {max_d:.2e}", file=sys.stderr)
        # reassociation noise across tiers reads ~1e-5 mean; the bf16
        # truncation signature reads ~1e-3 — 1e-4 splits them decisively
        assert mean_d < 1e-4, f"{what}: mean rel err {mean_d:.2e} (compiled)"
        assert frac_big < 1e-3, (f"{what}: {frac_big:.2e} of elements off "
                                 f">1e-3 (compiled)")
        assert max_d < outlier_bound, (f"{what}: max rel err {max_d:.2e} "
                                       f"(compiled)")

    assert_parity(img_p, img_x, "pallas vs xla IMAGE", 0.02)
    assert_parity(grad_p, grad_x, "pallas vs xla GRAD", 0.02)

    # env-map blocked sampler vs generic gather/scatter, compiled,
    # including an azimuth-seam-crossing frame
    from adgs_tpu.ops import grid_sample as gs
    from adgs_tpu.models.env_map import _grid_sample_align_corners
    grid = jnp.asarray(rng.normal(size=(3, 512, 512)).astype(np.float32))
    H, W = 40, 96
    yy = np.linspace(0.1, 0.3, H)
    xx = np.linspace(0.92, 1.08, W)
    xx = np.where(xx > 1.0, xx - 2.0, xx)
    coords = jnp.asarray(np.clip(np.stack(
        np.meshgrid(xx, yy, indexing="xy"), axis=-1), -1, 1)
        .astype(np.float32))
    nby, nbx = -(-H // gs.BH), -(-W // gs.BW)
    *_, ok = gs._tap_blocks(grid.shape, coords, H, W, nby, nbx)
    assert bool(ok), "env fast path must cover the seam frame"
    gcot = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))

    @jax.jit
    def env_pair(g):
        fast = gs.grid_sample_image(g, coords)
        gen = _grid_sample_align_corners(g, coords)
        d_fast = jax.grad(
            lambda gg: jnp.sum(gs.grid_sample_image(gg, coords) * gcot))(g)
        d_gen = jax.grad(lambda gg: jnp.sum(
            _grid_sample_align_corners(gg, coords) * gcot))(g)
        return fast, gen, d_fast, d_gen

    fast, gen, d_fast, d_gen = jax.tree.map(np.asarray, env_pair(grid))
    np.testing.assert_allclose(fast, gen, rtol=1e-5, atol=1e-5,
                               err_msg="env sampler FWD mismatch (compiled)")
    np.testing.assert_allclose(d_fast, d_gen, rtol=1e-5, atol=1e-5,
                               err_msg="env sampler BWD mismatch (compiled)")

    # KNN group-variance regularizer: the sort-tier backward compiled,
    # grads compared against the autodiff scatter (in-step fault classes
    # are invisible to interpret-mode tests; this exercises the compiled
    # path at a moderate shape — the 1M full-step composition is
    # bench-side)
    from adgs_tpu.train import losses as loss_lib
    No, A, K = 64_000, 8_000, 8
    vals = jnp.asarray(rng.normal(size=(No, 96)).astype(np.float32))
    g_idx = jnp.asarray(rng.integers(0, No, (A, K)), jnp.int32)
    g_valid = jnp.asarray(np.ones(A, bool))

    prev = loss_lib.REG_MXU
    grads_by_tier = {}
    try:
        for tier in (0, 2):
            loss_lib.REG_MXU = tier
            grads_by_tier[tier] = np.asarray(jax.jit(jax.grad(
                lambda v: loss_lib._group_variance_loss(
                    v, g_idx, g_valid)))(vals))
    finally:
        loss_lib.REG_MXU = prev
    np.testing.assert_allclose(
        grads_by_tier[2], grads_by_tier[0], rtol=1e-4, atol=1e-7,
        err_msg="group-variance tier 2 vs scatter grad mismatch (compiled)")

    print("# compiled parity: pallas==xla raster (image+grad), "
          "env fast==generic (fwd+bwd, seam), "
          "reg MXU==scatter grads -- OK", file=sys.stderr)


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import wait_for_tpu  # bring-up retry lives in one place
    phase = "tpu_bringup"
    try:
        diag = wait_for_tpu()
        if diag is not None:
            raise RuntimeError(f"TPU unavailable after retries: {diag}")
        phase = "parity"
        compiled_parity_check()
    except Exception as e:  # structured diagnosis, never a bare stack trace
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({"parity": "fail", "phase": phase,
                          "error": f"{type(e).__name__}: {e}"[:500]}))
        return 0
    print(json.dumps({"parity": "ok"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
