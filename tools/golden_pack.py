"""CUDA-parity golden-fixture format (FROZEN) + deterministic case synth.

A golden pack is a directory of ``case_*.npz`` files, each one a complete
record of the reference CUDA rasterizer's behavior on one tiny scene:
inputs, forward outputs, a fixed cotangent, and input gradients. The pack
is generated ONCE on a GPU machine with the reference checkout
(tools/make_golden_pack.py) and committed; tools/parity_check.py replays
the inputs through adgs_tpu's `rasterize()` on any backend and compares.

Fixture schema (npz keys) — version 1, do not change without bumping:

  meta
    version        ()      int32   fixture schema version (== 1)
    seed           ()      int32   synth seed (inputs are re-derivable)
  inputs (float32 unless noted)
    means3d        [N, 3]
    scales         [N, 3]
    rotations      [N, 4]          unnormalized; consumer normalizes
    opacities      [N]             post-sigmoid opacity in [0, 1]
    shs            [N, K, 3]       K = (sh_degree+1)**2
    flow_points    [N, 3]          (optional; omitted when absent)
    semantic       [N, S]          (optional)
  camera (float32)
    viewmatrix     [4, 4]          TRANSPOSED world->view (reference layout,
                                   utils/graphics_utils.py getWorld2View2().T)
    projmatrix     [4, 4]          TRANSPOSED full world->NDC product
    campos         [3]
    bg             [3]
    image_height   ()      int32
    image_width    ()      int32
    tanfovx        ()      float64
    tanfovy        ()      float64
    sh_degree      ()      int32
    scale_modifier ()      float64
    inv_depth      ()      bool
  reference forward (float32)
    out_color      [3, H, W]
    out_depth      [1, H, W]
    out_opacity    [1, H, W]
    out_radii      [N]     int32
    out_flow       [3, H, W]       (when flow_points present)
    out_semantic   [S, H, W]       (when semantic present)
  cotangent (float32; derived from seed, but stored for exactness)
    d_color        [3, H, W]
    d_depth        [1, H, W]
  reference gradients (float32)
    g_means3d      [N, 3]
    g_means2d      [N, 3]          screen-space grad (densify statistic;
                                   reference means2d is [N, 3] with z unused)
    g_opacities    [N]  (reference shape [N, 1] squeezed)
    g_scales       [N, 3]
    g_rotations    [N, 4]
    g_shs          [N, K, 3]

Comparison contract (BASELINE.md "allclose per camera"): forward images
atol 1e-4 / rtol 1e-4 after both sides clamp to the composited range,
radii exact, gradients atol 1e-3 / rtol 1e-2 relative to grad-norm scale
(the CUDA backward reorders float sums; bit-exactness is not expected).
"""

from __future__ import annotations

import glob
import os

import numpy as np

VERSION = 1
GRAD_KEYS = ("g_means3d", "g_means2d", "g_opacities", "g_scales",
             "g_rotations", "g_shs")
FWD_KEYS = ("out_color", "out_depth", "out_opacity", "out_radii")


def synth_case(seed: int, n: int = 300, H: int = 64, W: int = 96,
               sh_degree: int = 3, with_flow: bool = False,
               with_semantic: int = 0) -> dict:
    """Deterministic tiny-scene inputs. Both the GPU generator and the
    parity checker call this, so a pack is re-derivable from seeds alone
    (the npz still stores inputs — belt and braces)."""
    rng = np.random.default_rng(seed)
    K = (sh_degree + 1) ** 2
    fx = fy = 0.9 * W
    tanfovx = W / (2.0 * fx)
    tanfovy = H / (2.0 * fy)

    case = dict(
        version=np.int32(VERSION), seed=np.int32(seed),
        means3d=np.asarray(
            np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-1.8, 1.8, n),
                      rng.uniform(2.0, 9.0, n)], axis=-1), np.float32),
        scales=np.exp(rng.uniform(-3.6, -1.6, (n, 3))).astype(np.float32),
        rotations=rng.normal(size=(n, 4)).astype(np.float32),
        opacities=rng.uniform(0.25, 0.95, n).astype(np.float32),
        shs=(rng.normal(size=(n, K, 3)) * 0.35).astype(np.float32),
        viewmatrix=np.eye(4, dtype=np.float32),  # camera at origin, +z fwd
        campos=np.zeros(3, np.float32),
        bg=np.asarray([0.1, 0.2, 0.3], np.float32),
        image_height=np.int32(H), image_width=np.int32(W),
        tanfovx=float(tanfovx), tanfovy=float(tanfovy),
        sh_degree=np.int32(sh_degree), scale_modifier=1.0,
        inv_depth=True,
    )
    # transposed full projection product, reference convention
    # (utils/graphics_utils.py getProjectionMatrix; view here = identity)
    znear, zfar = 0.01, 100.0
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1.0 / tanfovx
    P[1, 1] = 1.0 / tanfovy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    case["projmatrix"] = (case["viewmatrix"] @ P.T).astype(np.float32)
    if with_flow:
        case["flow_points"] = (case["means3d"]
                               + rng.normal(size=(n, 3)).astype(np.float32)
                               * 0.05)
    if with_semantic:
        case["semantic"] = rng.uniform(
            0, 1, (n, with_semantic)).astype(np.float32)
    # fixed cotangents
    case["d_color"] = rng.normal(size=(3, H, W)).astype(np.float32)
    case["d_depth"] = (rng.normal(size=(1, H, W)) * 0.2).astype(np.float32)
    return case


DEFAULT_CASES = (
    dict(seed=11, n=300),                      # plain RGB+depth
    dict(seed=23, n=800, sh_degree=1),         # low SH degree, denser
    dict(seed=37, n=300, with_flow=True, with_semantic=4),  # all channels
)


def pack_dir(root: str | None = None) -> str:
    return root or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")


def load_pack(root: str | None = None) -> list[dict]:
    """All case_*.npz in the pack dir as dicts ([] when absent)."""
    d = pack_dir(root)
    cases = []
    for p in sorted(glob.glob(os.path.join(d, "case_*.npz"))):
        with np.load(p, allow_pickle=False) as z:
            c = {k: z[k] for k in z.files}
        assert int(c["version"]) == VERSION, (
            f"{p}: schema version {int(c['version'])} != {VERSION}")
        c["__path__"] = p
        cases.append(c)
    return cases


def save_case(path: str, case: dict) -> None:
    np.savez_compressed(path, **{k: v for k, v in case.items()
                                 if not k.startswith("__")})
