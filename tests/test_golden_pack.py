"""Golden-pack harness self-test (tools/golden_pack.py, parity_check.py).

The real pack is generated once on a GPU machine against the reference
CUDA rasterizer (tools/make_golden_pack.py). Until those npz files are
committed, this suite pins down everything that CAN be tested here:
  - clean SKIP when the pack directory is empty,
  - schema round-trip (save_case/load_pack, version gate),
  - the checker itself, by generating a stand-in pack from our own
    `reference` oracle backend and replaying it through the `xla` tier —
    so the comparator, settings mapping, quaternion-normalization
    convention, and grad plumbing are all exercised end to end,
  - a deliberately corrupted fixture FAILS (the comparator has teeth).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

from golden_pack import (DEFAULT_CASES, VERSION, load_pack,  # noqa: E402
                         save_case, synth_case)


def _make_standin_pack(out_dir, cases=((dict(seed=11, n=120, H=48, W=64)),)):
    """Generate fixtures with the reference-oracle backend standing in for
    the CUDA rasterizer (same role as tools/make_golden_pack.py)."""
    import jax
    import jax.numpy as jnp
    from adgs_tpu.raster.api import rasterize
    from adgs_tpu.raster.types import RasterSettings

    os.makedirs(out_dir, exist_ok=True)
    for i, kw in enumerate(cases):
        case = synth_case(**kw)
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
        d_color = jnp.asarray(case["d_color"])
        d_depth = jnp.asarray(case["d_depth"])

        def loss_fn(leaves):
            means3d, opac, scales, rot, shs, off = leaves
            q = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
            out = rasterize(means3d, opac, scales, q, settings, shs=shs,
                            screen_offset=off, backend="reference")
            return (jnp.sum(out.color * d_color)
                    + jnp.sum(out.depth * d_depth)), out

        leaves = (jnp.asarray(case["means3d"]),
                  jnp.asarray(case["opacities"]),
                  jnp.asarray(case["scales"]),
                  jnp.asarray(case["rotations"]),
                  jnp.asarray(case["shs"]),
                  jnp.zeros((len(case["means3d"]), 2), jnp.float32))
        (_, out), g = jax.value_and_grad(loss_fn, has_aux=True)(leaves)
        case.update(
            out_color=np.asarray(out.color), out_depth=np.asarray(out.depth),
            out_opacity=np.asarray(out.opacity),
            out_radii=np.asarray(out.radii, np.int32),
            g_means3d=np.asarray(g[0]), g_opacities=np.asarray(g[1]),
            g_scales=np.asarray(g[2]), g_rotations=np.asarray(g[3]),
            g_shs=np.asarray(g[4]),
            # reference stores [N, 3] means2d grads with unused z
            g_means2d=np.concatenate(
                [np.asarray(g[5]),
                 np.zeros((len(case["means3d"]), 1), np.float32)], axis=1))
        save_case(os.path.join(out_dir, f"case_{i:02d}.npz"), case)


def _run_checker(pack, backend="xla"):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         "--pack", pack, "--backend", backend],
        capture_output=True, text=True, timeout=600)


class TestHarness:
    def test_skip_when_empty(self, tmp_path):
        r = _run_checker(str(tmp_path / "nothing"))
        assert r.returncode == 0, r.stdout + r.stderr
        assert "SKIP" in r.stdout

    def test_schema_roundtrip(self, tmp_path):
        case = synth_case(seed=5, n=16, H=32, W=32)
        save_case(str(tmp_path / "case_00.npz"), case)
        back = load_pack(str(tmp_path))
        assert len(back) == 1 and int(back[0]["version"]) == VERSION
        for k, v in case.items():
            np.testing.assert_array_equal(np.asarray(back[0][k]),
                                          np.asarray(v), err_msg=k)

    def test_default_cases_are_derivable(self):
        for kw in DEFAULT_CASES:
            c = synth_case(**kw)
            c2 = synth_case(**kw)
            np.testing.assert_array_equal(c["means3d"], c2["means3d"])
            assert c["shs"].shape[1] == (int(c["sh_degree"]) + 1) ** 2

    def test_replay_passes_against_standin(self, tmp_path):
        pack = str(tmp_path / "golden")
        _make_standin_pack(pack)
        r = _run_checker(pack, backend="xla")
        assert r.returncode == 0, r.stdout + r.stderr
        assert "1/1 cases passed" in r.stdout

    def test_corrupted_fixture_fails(self, tmp_path):
        pack = str(tmp_path / "golden")
        _make_standin_pack(pack)
        p = os.path.join(pack, "case_00.npz")
        c = dict(np.load(p, allow_pickle=False))
        c["out_color"] = c["out_color"] + 0.05
        save_case(p, c)
        r = _run_checker(pack, backend="xla")
        assert r.returncode == 1
        assert "out_color" in r.stdout


def test_committed_pack_replays():
    """When the real CUDA pack lands in tests/golden/, replay it on the
    xla tier; until then this skips (mirrors parity_check's CLI skip)."""
    cases = load_pack()
    if not cases:
        pytest.skip("no committed golden pack yet (tools/make_golden_pack.py)")
    from parity_check import check_case
    for c in cases:
        errs = check_case(c, "xla")
        assert not errs, f"{c['__path__']}: {errs}"
