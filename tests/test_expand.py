"""Pallas instance-expansion kernel (raster/pallas/expand.py): bitwise
parity with the XLA scatter+cumsum expansion, including the runtime
window-coverage fallback (rasterizer_impl.cu:70-111 duplicateWithKeys
semantics are the shared contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from adgs_tpu.raster import binning as binning_lib
from adgs_tpu.raster import preprocess as prep_lib
from adgs_tpu.raster.pallas import expand as expand_lib
from tests import scene_fixtures as fx

_FIELDS = ("gauss_id", "tile_id", "valid", "tile_start", "tile_count",
           "slot_sorted", "gauss_start")


def _prep(rng, n=700, w=96, h=80):
    cam = fx.make_camera(width=w, height=h)
    st = fx.settings_from_camera(cam)
    g = fx.make_gaussians(rng, n=n)
    return prep_lib.preprocess(g["means3d"], g["scales"], g["rotations"],
                               g["opacities"], None, st), st, g


def _assert_binning_equal(a, b, msg=""):
    for name in _FIELDS:
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=f"{msg}{name}")
    assert int(a.num_rendered) == int(b.num_rendered)
    assert bool(a.overflow) == bool(b.overflow)


class TestExpandParity:
    @pytest.mark.parametrize("capacity", [1 << 13, 1 << 14])
    def test_matches_xla(self, rng, capacity):
        prep, st, _ = _prep(rng)
        bx = binning_lib.bin_gaussians(prep, st, capacity=capacity,
                                       expander="xla")
        bp = binning_lib.bin_gaussians(prep, st, capacity=capacity,
                                       expander="pallas")
        ba = binning_lib.bin_gaussians(prep, st, capacity=capacity,
                                       expander="auto")
        _assert_binning_equal(bx, bp, "pallas ")
        _assert_binning_equal(bx, ba, "auto ")
        assert int(bx.num_rendered) > 0

    def test_overflow_truncation_matches(self, rng):
        prep, st, _ = _prep(rng)
        # capacity below num_rendered: both expanders must truncate the
        # same presort slots (rasterizer_impl.cu sizes exactly; we flag)
        bx = binning_lib.bin_gaussians(prep, st, capacity=512,
                                       expander="xla")
        bp = binning_lib.bin_gaussians(prep, st, capacity=512,
                                       expander="pallas")
        assert bool(bx.overflow)
        _assert_binning_equal(bx, bp)

    def test_compact_on_uncoverable_window(self, rng):
        # 97% of gaussians culled: BLK-slot blocks span >GW table columns,
        # so the auto path must take the live-compacted expansion (whose
        # GW_COMPACT window covers by construction) and match XLA bitwise
        cam = fx.make_camera(width=96, height=80)
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=4000)
        m = np.array(g["means3d"], copy=True)
        m[np.asarray(rng.random(4000) < 0.97), 2] = -5.0
        prep = prep_lib.preprocess(jnp.asarray(m), g["scales"],
                                   g["rotations"], g["opacities"], None, st)
        offsets = binning_lib.cumsum_mxu(prep.tiles_touched)
        starts = offsets - prep.tiles_touched
        _, ok = expand_lib.window_starts(offsets, starts, 1 << 13)
        assert not bool(ok)
        # the compacted window must cover by construction
        dq = binning_lib.quantize_depth(prep.depth, st.num_tiles)
        _, _, ok_c = expand_lib.compact_live_table(
            prep.tiles_touched, starts, offsets, prep.rect_min,
            prep.rect_max, dq, 1 << 13)
        assert bool(ok_c)
        bx = binning_lib.bin_gaussians(prep, st, capacity=1 << 13,
                                       expander="xla")
        ba = binning_lib.bin_gaussians(prep, st, capacity=1 << 13,
                                       expander="auto")
        _assert_binning_equal(bx, ba)
        assert int(bx.num_rendered) > 0

    def test_compact_all_dead(self, rng):
        # every gaussian culled: the compacted table is pure padding and
        # binning must produce an empty (but well-formed) result
        cam = fx.make_camera(width=96, height=80)
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=512)
        m = np.array(g["means3d"], copy=True)
        m[:, 2] = -5.0
        prep = prep_lib.preprocess(jnp.asarray(m), g["scales"],
                                   g["rotations"], g["opacities"], None, st)
        offsets = binning_lib.cumsum_mxu(prep.tiles_touched)
        starts = offsets - prep.tiles_touched
        dq = binning_lib.quantize_depth(prep.depth, st.num_tiles)
        _, _, ok_c = expand_lib.compact_live_table(
            prep.tiles_touched, starts, offsets, prep.rect_min,
            prep.rect_max, dq, 1 << 13)
        assert bool(ok_c)
        bx = binning_lib.bin_gaussians(prep, st, capacity=1 << 13,
                                       expander="xla")
        ba = binning_lib.bin_gaussians(prep, st, capacity=1 << 13,
                                       expander="auto")
        _assert_binning_equal(bx, ba)
        assert int(bx.num_rendered) == 0

    def test_compact_with_overflow(self, rng):
        # heavy culling AND capacity below num_rendered: the compacted
        # windowed expansion must truncate the same presort slots as XLA
        cam = fx.make_camera(width=96, height=80)
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=4000)
        m = np.array(g["means3d"], copy=True)
        m[np.asarray(rng.random(4000) < 0.9), 2] = -5.0
        prep = prep_lib.preprocess(jnp.asarray(m), g["scales"],
                                   g["rotations"], g["opacities"], None, st)
        offsets = binning_lib.cumsum_mxu(prep.tiles_touched)
        starts = offsets - prep.tiles_touched
        _, ok = expand_lib.window_starts(offsets, starts, 512)
        bx = binning_lib.bin_gaussians(prep, st, capacity=512,
                                       expander="xla")
        ba = binning_lib.bin_gaussians(prep, st, capacity=512,
                                       expander="auto")
        assert bool(bx.overflow)
        _assert_binning_equal(bx, ba)

    def test_unaligned_capacity_uses_xla(self, rng):
        # capacity not a multiple of the kernel block (BLK=256) falls back
        # statically — 640 = 2.5 * BLK keeps exercising that branch if BLK
        # ever changes to another power of two <= 640
        from adgs_tpu.raster.pallas import expand as expand_lib
        assert 640 % expand_lib.BLK != 0
        prep, st, _ = _prep(rng, n=300)
        bx = binning_lib.bin_gaussians(prep, st, capacity=640,
                                       expander="xla")
        ba = binning_lib.bin_gaussians(prep, st, capacity=640,
                                       expander="auto")
        _assert_binning_equal(bx, ba)
