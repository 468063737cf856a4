"""Replay the CUDA-parity golden pack through adgs_tpu's rasterizer.

Usage:
    python tools/parity_check.py [--backend reference|xla|pallas]
                                 [--pack tests/golden] [--platform cpu|tpu]

Exits 0 with "SKIP (no golden pack...)" when the pack directory holds no
fixtures — the harness is committed ahead of the one-time GPU generation
step (tools/make_golden_pack.py). With fixtures present it checks, per
case: forward images (atol/rtol 1e-4), radii (exact), and input gradients
(atol 1e-3 / rtol 1e-2) against the reference CUDA rasterizer's dumps
(north-star metric #1, BASELINE.md "allclose per camera"; backward
semantics backward.cu:417-646). Exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_pack import GRAD_KEYS, load_pack, pack_dir  # noqa: E402


def check_case(case: dict, backend: str) -> list[str]:
    import jax
    import jax.numpy as jnp
    from adgs_tpu.raster.api import rasterize
    from adgs_tpu.raster.types import RasterSettings

    settings = RasterSettings(
        viewmatrix=jnp.asarray(case["viewmatrix"]),
        projmatrix=jnp.asarray(case["projmatrix"]),
        campos=jnp.asarray(case["campos"]), bg=jnp.asarray(case["bg"]),
        image_height=int(case["image_height"]),
        image_width=int(case["image_width"]),
        tanfovx=float(case["tanfovx"]), tanfovy=float(case["tanfovy"]),
        sh_degree=int(case["sh_degree"]),
        scale_modifier=float(case["scale_modifier"]),
        inv_depth=bool(case["inv_depth"]))

    flow = (jnp.asarray(case["flow_points"]) if "flow_points" in case
            else None)
    sem = jnp.asarray(case["semantic"]) if "semantic" in case else None
    d_color = jnp.asarray(case["d_color"])
    d_depth = jnp.asarray(case["d_depth"])

    def fwd(means3d, opacities, scales, rotations, shs, screen_offset):
        # the reference kernel normalizes quaternions internally
        # (forward.cu computeCov3D); our preprocess expects unit wxyz,
        # so normalization lives INSIDE the traced fn for grad parity
        q = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
        return rasterize(means3d, opacities, scales, q, settings, shs=shs,
                         flow_points=flow, semantic=sem,
                         screen_offset=screen_offset, backend=backend,
                         capacity=1 << 16, max_per_tile=1024)

    def loss_fn(leaves):
        out = fwd(*leaves)
        return (jnp.sum(out.color * d_color)
                + jnp.sum(out.depth * d_depth)), out

    leaves = (jnp.asarray(case["means3d"]), jnp.asarray(case["opacities"]),
              jnp.asarray(case["scales"]), jnp.asarray(case["rotations"]),
              jnp.asarray(case["shs"]),
              jnp.zeros((len(case["means3d"]), 2), jnp.float32))
    (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(leaves)

    errs = []

    def cmp(name, got, want, atol, rtol):
        got = np.asarray(got, np.float64)
        want = np.asarray(want, np.float64)
        if got.shape != want.shape:
            errs.append(f"{name}: shape {got.shape} != {want.shape}")
            return
        bad = ~np.isclose(got, want, atol=atol, rtol=rtol)
        if bad.any():
            i = np.unravel_index(np.argmax(np.abs(got - want)), got.shape)
            errs.append(
                f"{name}: {bad.sum()}/{bad.size} mismatched, worst at "
                f"{i}: got {got[i]:.6g} want {want[i]:.6g}")

    cmp("out_color", out.color, case["out_color"], 1e-4, 1e-4)
    cmp("out_depth", out.depth, case["out_depth"], 1e-4, 1e-4)
    cmp("out_opacity", out.opacity, case["out_opacity"], 1e-4, 1e-4)
    if not np.array_equal(np.asarray(out.radii), case["out_radii"]):
        n_bad = int((np.asarray(out.radii) != case["out_radii"]).sum())
        errs.append(f"out_radii: {n_bad} mismatched (exact compare)")
    if "out_flow" in case:
        cmp("out_flow", out.flow, case["out_flow"], 1e-4, 1e-4)
    if "out_semantic" in case:
        cmp("out_semantic", out.semantic, case["out_semantic"], 1e-4, 1e-4)

    got_g = dict(g_means3d=grads[0], g_opacities=grads[1],
                 g_scales=grads[2], g_rotations=grads[3], g_shs=grads[4],
                 g_means2d=grads[5])
    for k in GRAD_KEYS:
        if k not in case:
            continue
        want = case[k]
        if k == "g_means2d":     # reference means2d is [N, 3], z unused
            want = want[:, :2]
        cmp(k, got_g[k], want, 1e-3, 1e-2)
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="xla",
                    choices=["reference", "xla", "pallas"])
    ap.add_argument("--pack", default=None)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)

    cases = load_pack(args.pack)
    if not cases:
        print(f"SKIP (no golden pack in {pack_dir(args.pack)}; generate "
              "once on a GPU machine with tools/make_golden_pack.py)")
        return 0

    failed = 0
    for c in cases:
        errs = check_case(c, args.backend)
        tag = os.path.basename(c["__path__"])
        if errs:
            failed += 1
            print(f"FAIL {tag} [{args.backend}]")
            for e in errs:
                print(f"  {e}")
        else:
            print(f"ok   {tag} [{args.backend}]")
    print(f"{len(cases) - failed}/{len(cases)} cases passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
