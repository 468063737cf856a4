"""Tile binning: duplicated-instance expansion, (tile, depth) sort, ranges.

TPU-native replacement for the reference's cub pipeline
(rasterizer_impl.cu:70-138, 284-325):

  - duplicateWithKeys scatter -> a GATHER-based expansion: instance slot r
    finds its Gaussian with a scatter+cumsum inversion of the inclusive
    prefix sum of tiles_touched, then derives its (tile_x, tile_y) from the
    slot's local index inside the Gaussian's rect. Static capacity R
    replaces the data-dependent num_rendered; overflow is reported, not
    hidden.
  - the 64-bit [tileID|depth-bits] radix sort -> a SINGLE-key u32 sort on
    [tile_bits | depth_bits]: the tile id takes ceil(log2(num_tiles+1))
    high bits and the depth the remaining low bits (top bits of the IEEE
    pattern — monotonic for the positive depths that survive culling).
    One packed key + two payloads sorts ~40% less data than the previous
    two-key (tile, f32 depth) form. Ties within the quantized depth
    resolve by the stable presort (gaussian-id) order, matching the
    reference's stable radix sort semantics.
  - identifyTileRanges -> searchsorted boundaries on the sorted tile ids.

The sort carries the PRESORT slot index as a payload: presort slots are
gaussian-major (every Gaussian's instances contiguous, boundaries = the
expansion prefix sums), which is what the backward's per-Gaussian gradient
reduction keys on — no argsort needed downstream.

Everything is integer/index math — gradients flow through the downstream
GATHERS of per-Gaussian data, not through this module.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed
from .types import RasterSettings

INSTANCE_ALIGN = 256  # capacity rounds up to the Pallas DMA chunk size

_CUMSUM_BLK = 512


def cumsum_mxu(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 1-D integer cumsum as a blocked triangular MXU matmul.

    XLA's native cumsum over a multi-million-element axis costs ~5ms on
    TPU (log-pass scan lowering); one [L/B, B] x [B, B] upper-triangular
    ones matmul plus a tiny carry cumsum runs at MXU speed (~0.3ms at 2M).
    f32 accumulation is EXACT for sums < 2^23 (the bf16 hi-limb partial
    sums can overshoot the true total ~2^-9 relative, so keep a margin
    below f32's 2^24 exact-integer ceiling) — callers' sums are instance
    counts bounded by the pallas-expansion gate (<2^23 = 8.4M)."""
    L = x.shape[0]
    B = _CUMSUM_BLK
    if L < 4 * B:
        return jnp.cumsum(x)
    pad = (-L) % B
    xf = x.astype(jnp.float32)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), jnp.float32)])
    xb = xf.reshape(-1, B)
    tri = jnp.triu(jnp.ones((B, B), jnp.float32))   # tri[k, j] = 1, k <= j
    # limb-split cheap precision (render.py LIMB note): tri is 0/1 and the
    # counts are ints < 2^24 whose three bf16 limbs are disjoint mantissa
    # windows — 3 DEFAULT passes reproduce HIGHEST bitwise at half the cost
    hi = xb.astype(jnp.bfloat16).astype(jnp.float32)
    rem = xb - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    limbs = jnp.concatenate([hi, mid, rem - mid], axis=0)
    loc3 = jax.lax.dot_general(
        limbs, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # inclusive per block
    nb = xb.shape[0]
    local = loc3[:nb] + loc3[nb:2 * nb] + loc3[2 * nb:]
    row_tot = local[:, -1]
    carry = jnp.cumsum(row_tot) - row_tot            # [L/B] — tiny
    out = (local + carry[:, None]).reshape(-1)[:L]
    return out.astype(x.dtype)


class Binning(NamedTuple):
    gauss_id: jnp.ndarray     # [R] int32, sorted by (tile, depth); padding -> 0
    tile_id: jnp.ndarray      # [R] int32; padding slots hold num_tiles
    valid: jnp.ndarray        # [R] bool
    tile_start: jnp.ndarray   # [T] int32 first sorted-instance index per tile
    tile_count: jnp.ndarray   # [T] int32 instances per tile
    num_rendered: jnp.ndarray  # scalar int32 (true count, may exceed R)
    overflow: jnp.ndarray     # scalar bool
    slot_sorted: jnp.ndarray  # [R] int32 presort (gaussian-major) slot per
    #                           sorted instance; padding slots hold R
    gauss_start: jnp.ndarray  # [N] int32 exclusive prefix sum of
    #                           tiles_touched (gaussian i's presort slots are
    #                           [gauss_start[i], gauss_start[i]+tiles[i]))
    window_ok: jnp.ndarray | None = None
    #                           scalar bool (None off the pallas path):
    #                           False = dead-gaussian runs blew the direct
    #                           window and "auto" took the live-compacted
    #                           expansion (one extra u32 sort + row gather,
    #                           ~4-5 ms at 1M — bench and perf labs report
    #                           its frequency)


def depth_bits_for(num_tiles: int) -> int:
    """Bits of IEEE-f32 depth kept in the packed sort key."""
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    return 32 - tile_bits


def quantize_depth(depth: jnp.ndarray, num_tiles: int) -> jnp.ndarray:
    """The depth ordinal used by the packed sort key (test-oracle hook).

    Top `depth_bits` of the IEEE pattern; monotonic for depth > 0."""
    d_bits = depth_bits_for(num_tiles)
    raw = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.uint32)
    return (raw >> jnp.uint32(32 - d_bits)).astype(jnp.uint32)


def bin_gaussians(prep: Preprocessed, settings: RasterSettings,
                  capacity: int, expander: str = "xla") -> Binning:
    """expander: "xla" (scatter+cumsum+gather), "pallas" (windowed one-hot
    MXU kernel, raster/pallas/expand.py), or "auto" (pallas with a runtime
    lax.cond fallback to xla when the static gaussian window cannot cover
    some slot block — see expand.window_starts).

    The default stays "xla" because this function is vmapped by the
    data-parallel batch step (vmap turns the cond into a both-branches
    select and scalar-prefetch pallas_calls don't batch); the staged
    single-camera entries (render.compute_binning, parallel/shard.py,
    bench.py) pass "auto" explicitly."""
    capacity = -(-capacity // INSTANCE_ALIGN) * INSTANCE_ALIGN
    N = prep.tiles_touched.shape[0]
    num_tiles = settings.num_tiles
    grid_x = settings.grid_x

    if N == 0:
        zero_t = jnp.zeros((num_tiles,), dtype=jnp.int32)
        return Binning(
            gauss_id=jnp.zeros((capacity,), dtype=jnp.int32),
            tile_id=jnp.full((capacity,), num_tiles, dtype=jnp.int32),
            valid=jnp.zeros((capacity,), dtype=bool),
            tile_start=zero_t, tile_count=zero_t,
            num_rendered=jnp.int32(0), overflow=jnp.asarray(False),
            slot_sorted=jnp.full((capacity,), capacity, dtype=jnp.int32),
            gauss_start=jnp.zeros((0,), dtype=jnp.int32),
        )

    tiles = prep.tiles_touched
    offsets = cumsum_mxu(tiles)                     # inclusive prefix sum
    num_rendered = offsets[-1]
    overflow = num_rendered > capacity
    starts = offsets - tiles                        # exclusive prefix sum
    d_bits = depth_bits_for(num_tiles)
    depth_q = quantize_depth(prep.depth, num_tiles).astype(jnp.int32)

    def _expand_xla():
        slot = jnp.arange(capacity, dtype=jnp.int32)
        # inverse of the prefix sum WITHOUT searchsorted: the query set is
        # the (already sorted) slot range, so the gaussian id per slot is a
        # scatter of +1 at each gaussian's start offset followed by a
        # cumsum — ~5x faster than searchsorted on TPU (empty gaussians
        # collapse onto the same offset and accumulate, skipping them
        # exactly). starts is non-decreasing — the sorted-indices hint
        # keeps the scatter on its fast path.
        bump = jnp.zeros(capacity, jnp.int32).at[starts].add(
            jnp.ones_like(starts, jnp.int32), mode="drop",
            indices_are_sorted=True)
        gid = cumsum_mxu(bump) - 1
        valid = slot < num_rendered
        gid = jnp.clip(gid, 0, max(N - 1, 0))

        # pack the per-gaussian lookups into one row-gather and isolate it
        # with a barrier: gathers embedded in elementwise fusions fall off
        # the fast dynamic-gather path and scalarize (profiled ~10x slower)
        table = jnp.stack([starts,
                           prep.rect_min[:, 0], prep.rect_min[:, 1],
                           prep.rect_max[:, 0], depth_q], axis=-1)
        gid_b = jax.lax.optimization_barrier(gid)
        g_rows = jax.lax.optimization_barrier(table[gid_b])
        excl = g_rows[:, 0]
        local = slot - excl
        rect_w = jnp.maximum(g_rows[:, 3] - g_rows[:, 1], 1)
        # data-dependent integer div/mod is slow on the VPU; local and
        # rect_w are far below 2^23 so f32 division is exact after floor
        ly = jnp.floor(local.astype(jnp.float32)
                       / rect_w.astype(jnp.float32)).astype(jnp.int32)
        lx = local - ly * rect_w
        ty = g_rows[:, 2] + ly
        tx = g_rows[:, 1] + lx
        tile = jnp.where(valid, ty * grid_x + tx,
                         num_tiles).astype(jnp.uint32)
        key = (tile << jnp.uint32(d_bits)) | g_rows[:, 4].astype(jnp.uint32)
        # padding keys keep the clamped gaussian's depth bits (harmless —
        # tile == num_tiles sorts them last either way); zero them so the
        # pallas expander (which emits zero depth bits on padding) is
        # bitwise-interchangeable under the auto fallback
        key = jnp.where(valid, key,
                        jnp.uint32(num_tiles) << jnp.uint32(d_bits))
        gid = jnp.where(valid, gid, 0)
        return key, gid

    window_ok_out = None
    if expander != "xla" and N > 0:
        from .pallas import expand as expand_lib
    if (expander != "xla" and N > 0
            and capacity % expand_lib.BLK == 0):
        tbl = expand_lib.build_table(starts, offsets, prep.rect_min,
                                     prep.rect_max, depth_q)
        g_base, windows_ok = expand_lib.window_starts(offsets, starts,
                                                      capacity)
        # the f32 table is exact only below 2^24 (counts, ids); gate at
        # 2^23 for margin — bf16 hi-limb partial sums in the limb-split
        # dots can transiently overshoot the true total by ~2^-9 relative
        fits_f32 = (num_rendered < (1 << 23)) & (N < (1 << 23))
        windows_ok &= fits_f32

        def _expand_pallas():
            return expand_lib.expand_pallas(tbl, g_base, capacity, grid_x,
                                            d_bits, num_tiles)

        def _expand_compact():
            # dead-gaussian runs blew the direct window: reorder the table
            # live-first (bitwise-identical outputs) so the GW_COMPACT
            # window covers by construction; the residual XLA fallback can
            # only fire above the f32-exactness gate checked in fits_f32.
            # Tiers: "kernel" (streaming Pallas compactor, ~1 ms) vs
            # "sort" (u32 sort + row gather, ~5 ms) — same outputs.
            if expand_lib.COMPACT == "kernel":
                tbl_c, g_base_c, ok_c = expand_lib.compact_live_table_kernel(
                    starts, offsets, prep.rect_min, prep.rect_max,
                    depth_q, capacity)
            else:
                tbl_c, g_base_c, ok_c = expand_lib.compact_live_table(
                    prep.tiles_touched, starts, offsets, prep.rect_min,
                    prep.rect_max, depth_q, capacity)
            return jax.lax.cond(
                ok_c,
                lambda: expand_lib.expand_pallas(
                    tbl_c, g_base_c, capacity, grid_x, d_bits, num_tiles,
                    gw=expand_lib.GW_COMPACT),
                _expand_xla)

        if expander == "pallas":
            # forced-kernel callers (tests/perf labs) get no auto fallback:
            # warn loudly when the static window cannot cover some block —
            # the expansion output is garbage for the uncovered slots.
            # (jax.debug.print needs host callbacks, which the axon remote
            # backend does not support and reports platform 'tpu' — there
            # the Binning.window_ok field is the only signal; warn on CPU
            # only, where the interpret-mode tests run.)
            if jax.default_backend() == "cpu":
                jax.lax.cond(
                    windows_ok, lambda: None,
                    lambda: jax.debug.print(
                        "[adgs_tpu] WARNING: expander='pallas' forced but "
                        "the gaussian window cannot cover every slot block "
                        "(window_starts ok=False); output is unreliable — "
                        "use expander='auto'"))
            key, gid = _expand_pallas()
        else:
            key, gid = jax.lax.cond(
                windows_ok, _expand_pallas,
                lambda: jax.lax.cond(fits_f32, _expand_compact,
                                     _expand_xla))
        window_ok_out = windows_ok
    else:
        key, gid = _expand_xla()

    slot = jnp.arange(capacity, dtype=jnp.int32)
    key_s, gid_s, slot_s = jax.lax.sort(
        (key, gid, slot), num_keys=1, is_stable=True)
    tile_s = (key_s >> jnp.uint32(d_bits)).astype(jnp.int32)
    # padding slots were keyed tile == num_tiles, so they sort last and
    # validity needs no payload
    valid_s = tile_s < num_tiles

    t_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, t_idx, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_s, t_idx, side="right").astype(jnp.int32)

    return Binning(
        gauss_id=jnp.where(valid_s, gid_s, 0),
        tile_id=tile_s,
        valid=valid_s,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_rendered=num_rendered,
        overflow=overflow,
        slot_sorted=jnp.where(valid_s, slot_s, capacity),
        gauss_start=starts,
        window_ok=window_ok_out,
    )


def required_capacity(prep: Preprocessed) -> jnp.ndarray:
    """True num_rendered for capacity sizing (host-side decision)."""
    return jnp.sum(prep.tiles_touched)
