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

    @pytest.mark.parametrize("dead_frac", [0.0, 0.5, 0.97, 1.0])
    def test_kernel_compactor_matches_sort(self, rng, dead_frac):
        # the streaming Pallas compactor must produce the same live-first
        # table prefix, window bases and ok flag as the sort+gather form
        cam = fx.make_camera(width=96, height=80)
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=4000)
        m = np.array(g["means3d"], copy=True)
        if dead_frac:
            m[np.asarray(rng.random(4000) < dead_frac), 2] = -5.0
        prep = prep_lib.preprocess(jnp.asarray(m), g["scales"],
                                   g["rotations"], g["opacities"], None, st)
        offsets = binning_lib.cumsum_mxu(prep.tiles_touched)
        starts = offsets - prep.tiles_touched
        dq = binning_lib.quantize_depth(prep.depth, st.num_tiles)
        cap = 1 << 13
        tbl_s, gb_s, ok_s = expand_lib.compact_live_table(
            prep.tiles_touched, starts, offsets, prep.rect_min,
            prep.rect_max, dq, cap)
        tbl_k, gb_k, ok_k = expand_lib.compact_live_table_kernel(
            starts, offsets, prep.rect_min, prep.rect_max, dq, cap)
        n_live = int(jnp.sum(prep.tiles_touched > 0))
        np.testing.assert_array_equal(tbl_s[:, :n_live], tbl_k[:, :n_live])
        # dead/pad columns differ in filler (total/total vs zeros) but both
        # must be empty spans that never match a slot
        dead_k = np.asarray(tbl_k[:, n_live:])
        np.testing.assert_array_equal(dead_k[expand_lib._R_EXCL],
                                      dead_k[expand_lib._R_INCL])
        # bases agree for every block that has instances; tail blocks past
        # num_rendered may differ (the sort tier's searchsorted counts its
        # total-valued dead padding there) — they match nothing either way
        total = int(offsets[-1])
        qs = np.arange(cap // expand_lib.BLK) * expand_lib.BLK
        in_range = qs < total
        np.testing.assert_array_equal(np.asarray(gb_s)[in_range],
                                      np.asarray(gb_k)[in_range])
        assert bool(ok_s) == bool(ok_k)
        # and the expansions themselves are bitwise equal
        d_bits = binning_lib.depth_bits_for(st.num_tiles)
        key_s, gid_s = expand_lib.expand_pallas(
            tbl_s, gb_s, cap, st.grid_x, d_bits, st.num_tiles,
            gw=expand_lib.GW_COMPACT)
        key_k, gid_k = expand_lib.expand_pallas(
            tbl_k, gb_k, cap, st.grid_x, d_bits, st.num_tiles,
            gw=expand_lib.GW_COMPACT)
        np.testing.assert_array_equal(np.asarray(key_s), np.asarray(key_k))
        np.testing.assert_array_equal(np.asarray(gid_s), np.asarray(gid_k))

    def test_kernel_compactor_in_binning(self, rng, monkeypatch):
        # end-to-end: auto expander with COMPACT="kernel" matches XLA
        monkeypatch.setattr(expand_lib, "COMPACT", "kernel")
        cam = fx.make_camera(width=96, height=80)
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=4000)
        m = np.array(g["means3d"], copy=True)
        m[np.asarray(rng.random(4000) < 0.97), 2] = -5.0
        prep = prep_lib.preprocess(jnp.asarray(m), g["scales"],
                                   g["rotations"], g["opacities"], None, st)
        bx = binning_lib.bin_gaussians(prep, st, capacity=1 << 13,
                                       expander="xla")
        ba = binning_lib.bin_gaussians(prep, st, capacity=1 << 13,
                                       expander="auto")
        _assert_binning_equal(bx, ba)
        assert int(bx.num_rendered) > 0

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
