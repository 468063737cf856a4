"""Pallas instance-expansion kernel (duplicateWithKeys analog).

Replaces the XLA scatter+cumsum+row-gather expansion in binning.py with one
grid program per BLK-slot block that resolves slot->Gaussian membership as a
one-hot MXU matmul — the same trick as the gradient segment-reduce kernel
(render.py), run in the opposite direction:

  - program c owns instance slots [c*BLK, (c+1)*BLK); the Gaussians whose
    presort spans [start_g, start_g + tiles_g) intersect that range live in
    a contiguous index window (expansion spans are sorted), whose aligned
    start is scalar-prefetched;
  - membership member[s, g] = (pos_s >= excl_g) & (pos_s < incl_g) is a
    broadcast compare of a sublane slot iota against the lane-major table
    rows — every slot matches EXACTLY one Gaussian (spans partition the
    slot range), so gathering the per-Gaussian columns is
        val = tbl [F, GW] . member^T  ->  [F, BLK]
    one f32 matmul instead of the [R, 5]-row gather that dominates the XLA
    path (narrow row gathers crawl at ~80M rows/s on TPU, PERF.md);
  - the (tile | depth) sort key is then a few [1, BLK] lane-row integer ops
    (rasterizer_impl.cu:70-111 key semantics, exact float tile math as
    preprocess.get_rect).

The Gaussian window per block is bounded by BLK + 1 NON-EMPTY Gaussians but
unboundedly many empty (culled) ones can interleave; callers must check
window_spans_ok() and fall back to the XLA expansion (binning.py) via
lax.cond when the static window cannot cover a block — and when any count
exceeds f32's exact-integer range (2^24), where the f32 table would round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _limb3(x, axis):
    from .render import _limb3 as f
    return f(x, axis)


import os as _os  # noqa: E402
LIMB = int(_os.environ.get("ADGS_LIMB", "1"))
# live-compaction tier: "kernel" (streaming Pallas compactor) or "sort"
# (u32 sort + row gather) — bitwise-identical expansion outputs, verified
# compiled on chip (exp/lab_compactk.log). Kernel wins: train-shaped
# bin_step 13.9 -> 11.7 ms/it at 1M gaussians, 45% dead.
COMPACT = _os.environ.get("ADGS_COMPACT", "kernel")


BLK = 256        # instance slots per program
GW = 512         # gaussian window columns; the membership compare costs
#                  capacity x GW element ops, so the window stays as small
#                  as coverage allows (measured: (256,512) beats (512,1024)
#                  15.0 -> 12.3 ms bin_step at 1.78M capacity — and
#                  (128,384), where per-block overhead wins out again).
#                  Covers BLK+1 live gaussians at >= ~2/3 live density after
#                  the GALIGN start rounding; window_starts' ok flag guards
#                  sparser (heavily culled) scenes, which compact first.
GW_COMPACT = 384  # window for LIVE-COMPACTED tables: every span in the
#                  live prefix is non-empty, so a BLK-slot block intersects
#                  <= BLK+1 spans and the GALIGN start rounding wastes
#                  <= GALIGN-1 columns — 127 + 257 <= 384 covers ALWAYS
#                  (below the 2^24 f32-exactness gate); the smaller window
#                  also cuts the membership-compare cost 25%.
GALIGN = 128     # window start alignment (Mosaic lane-slice rule)
F_TBL = 8        # table rows: excl, incl, rmin_x, rmin_y, rect_w,
#                  dq_hi, dq_lo, gauss_index  (+ ones row would exceed 8;
#                  validity = incl > pos matched, see kernel)

_R_EXCL, _R_INCL, _R_RMX, _R_RMY, _R_RW, _R_DQH, _R_DQL, _R_GID = range(8)


def _expand_kernel(g_base, tbl_hbm, key_ref, gid_ref, buf, sem, *,
                   grid_x: int, d_bits: int, num_tiles: int, nblocks: int,
                   gw: int):
    c = pl.program_id(0)
    base = pl.multiple_of(g_base[c], GALIGN)

    def get_dma(slot, blk):
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(pl.multiple_of(g_base[blk], GALIGN), gw)],
            buf.at[slot], sem.at[slot])

    # cross-grid-step double buffering: the window for block c+1 was started
    # during block c (the grid is sequential); block 0 fetches its own
    @pl.when(c == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(c + 1 < nblocks)
    def _():
        get_dma((c + 1) % 2, c + 1).start()

    get_dma(c % 2, c).wait()
    tbl = buf[c % 2]                                       # [F_TBL, GW]

    pos_sub = (jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
               + c * BLK).astype(jnp.float32)              # [BLK, 1]
    excl = tbl[_R_EXCL:_R_EXCL + 1, :]                     # [1, GW]
    incl = tbl[_R_INCL:_R_INCL + 1, :]
    member = ((pos_sub >= excl) & (pos_sub < incl)).astype(jnp.float32)
    # val[f, s] = sum_g tbl[f, g] * member[s, g] — gather-as-matmul.
    # Exact cheap precision: member is 0/1 and the table rows are ints
    # < 2^24, whose three bf16 limbs are disjoint 8-bit mantissa windows
    # — 3 DEFAULT passes reproduce HIGHEST bitwise (render.py LIMB note).
    if LIMB:
        v = jax.lax.dot_general(
            _limb3(tbl, 0), member,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [3*F_TBL, BLK]
        val = v[:F_TBL] + v[F_TBL:2 * F_TBL] + v[2 * F_TBL:]
    else:
        val = jax.lax.dot_general(
            tbl, member, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # [F_TBL, BLK]

    pos = (jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
           + c * BLK).astype(jnp.float32)                  # [1, BLK]
    # a slot is live iff some span matched: then its incl column > pos
    valid = val[_R_INCL:_R_INCL + 1, :] > pos
    local = pos - val[_R_EXCL:_R_EXCL + 1, :]
    rw = jnp.maximum(val[_R_RW:_R_RW + 1, :], 1.0)
    # exact: local < tiles_g <= num_tiles << 2^23 (see binning.py)
    ly = jnp.floor(local / rw)
    lx = local - ly * rw
    ty = val[_R_RMY:_R_RMY + 1, :] + ly
    tx = val[_R_RMX:_R_RMX + 1, :] + lx
    tile = jnp.where(valid, (ty * grid_x + tx),
                     jnp.float32(num_tiles)).astype(jnp.int32)
    dq = (val[_R_DQH:_R_DQH + 1, :].astype(jnp.int32) * 16384
          + val[_R_DQL:_R_DQL + 1, :].astype(jnp.int32))
    dq = jnp.where(valid, dq, 0)
    key = (tile.astype(jnp.uint32) << jnp.uint32(d_bits)) | dq.astype(
        jnp.uint32)
    gid = jnp.where(valid, val[_R_GID:_R_GID + 1, :], 0.0).astype(jnp.int32)
    key_ref[0] = key
    gid_ref[0] = gid


def _n_pad(n: int, gw: int) -> int:
    return max(-(-n // GALIGN) * GALIGN, gw) + gw


def build_table(starts: jnp.ndarray, offsets: jnp.ndarray,
                rect_min: jnp.ndarray, rect_max: jnp.ndarray,
                depth_q: jnp.ndarray, gw: int = GW) -> jnp.ndarray:
    """[F_TBL, N_pad] f32 component-major per-Gaussian table (lane-major
    rows so the kernel's membership compare needs no transpose). All values
    are integers below 2^24, exact in f32 (callers gate on that)."""
    n = starts.shape[0]
    n_pad = _n_pad(n, gw)
    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    rows = jnp.stack([
        starts, offsets, rect_min[:, 0], rect_min[:, 1], rw,
        depth_q >> 14, depth_q & 0x3FFF,
        jnp.arange(n, dtype=jnp.int32)], axis=0).astype(jnp.float32)
    # pad columns read "empty span at num_rendered": excl == incl == total
    total = offsets[-1].astype(jnp.float32)
    pad = jnp.zeros((F_TBL, n_pad - n), jnp.float32)
    pad = pad.at[_R_EXCL].set(total).at[_R_INCL].set(total)
    return jnp.concatenate([rows, pad], axis=1)


def window_starts(offsets: jnp.ndarray, starts: jnp.ndarray,
                  capacity: int, gw: int = GW
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Aligned per-block gaussian-window starts + coverage flag.

    g_lo(c) = first gaussian whose span reaches past c*BLK;
    g_hi(c) = one past the last gaussian starting before (c+1)*BLK whose
    span is NON-EMPTY: any gaussian with start >= total has an empty span
    (spans partition [0, total)) and never matches a slot, so the block
    query is clamped to total — without the clamp, every block past the
    last live gaussian would demand a window over the dead/padding tail.
    The static [base, base+gw) window covers every block iff
    g_hi <= base + gw for all blocks (base = g_lo aligned down)."""
    nblocks = capacity // BLK
    total = offsets[-1]
    qs = jnp.arange(nblocks, dtype=jnp.int32) * BLK
    g_lo = jnp.searchsorted(offsets, qs, side="right").astype(jnp.int32)
    g_hi = jnp.searchsorted(starts, jnp.minimum(qs + BLK, total),
                            side="left").astype(jnp.int32)
    n = offsets.shape[0]
    n_pad = _n_pad(n, gw)
    base = jnp.clip((g_lo // GALIGN) * GALIGN, 0, n_pad - gw)
    ok = jnp.all(g_hi <= base + gw)
    return base, ok


def compact_live_table(tiles: jnp.ndarray, starts: jnp.ndarray,
                       offsets: jnp.ndarray, rect_min: jnp.ndarray,
                       rect_max: jnp.ndarray, depth_q: jnp.ndarray,
                       capacity: int
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Live-compacted expansion table -> (tbl [F_TBL, n_pad], g_base, ok).

    Dead gaussians (culled / time-gated / capacity padding) form long
    empty-span runs that blow the window span past GW (a train scene is
    ~50% dead and ALWAYS fell back to the XLA expansion, ~6-7 ms/it).
    Reordering the table columns live-first bounds every BLK-slot block's
    span by BLK+1 non-empty gaussians, so the GW_COMPACT=384 window covers
    by construction (ok stays as a belt-and-suspenders flag; it can only
    be False above the 2^24 f32-exactness gate, which callers check).

    The permutation comes from a single-operand u32 sort (dead-flag high
    bit | index; ~4 ms at 1M — measured far cheaper than any scatter form,
    exp/lab_compact.py) followed by ONE row gather of the row-major table.
    Outputs are bitwise identical to the uncompacted expansion: each slot
    still matches exactly one live span carrying identical values
    (including the original gaussian index in the _R_GID row)."""
    n = starts.shape[0]
    live = tiles > 0
    key = (jnp.where(live, jnp.uint32(0), jnp.uint32(1)) << 31
           | jnp.arange(n, dtype=jnp.uint32))
    (ks,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    orig = (ks & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)

    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    rows_rm = jnp.stack([
        starts, offsets, rect_min[:, 0], rect_min[:, 1], rw,
        depth_q.astype(jnp.int32) >> 14,
        depth_q.astype(jnp.int32) & 0x3FFF,
        jnp.arange(n, dtype=jnp.int32)], axis=-1).astype(jnp.float32)
    orig = jax.lax.optimization_barrier(orig)
    rows_rm = jax.lax.optimization_barrier(
        jax.lax.optimization_barrier(rows_rm)[orig])        # [N, F_TBL]

    # dead columns land in the tail carrying their ORIGINAL (interleaved)
    # start/offset values — rewrite both to total so the compacted
    # start/offset rows stay sorted for searchsorted (their spans were
    # already empty, so matching semantics are unchanged)
    total = offsets[-1].astype(jnp.float32)
    n_live = jnp.sum(live.astype(jnp.int32))
    is_pad = jnp.arange(n, dtype=jnp.int32) >= n_live      # [N]
    tbl_rm = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (n, F_TBL), 1) < 2)
        & is_pad[:, None], total, rows_rm)
    tbl = tbl_rm.T                                          # [F_TBL, N]

    n_pad = _n_pad(n, GW_COMPACT)
    pad = jnp.zeros((F_TBL, n_pad - n), jnp.float32)
    pad = pad.at[_R_EXCL].set(total).at[_R_INCL].set(total)
    tbl = jnp.concatenate([tbl, pad], axis=1)

    starts_c = tbl_rm[:, _R_EXCL].astype(jnp.int32)
    offsets_c = tbl_rm[:, _R_INCL].astype(jnp.int32)
    g_base, ok = window_starts(offsets_c, starts_c, capacity,
                               gw=GW_COMPACT)
    return tbl, g_base, ok


# --------------------------------------------------------------------------
# Streaming live-compaction kernel (replaces the u32-sort + row-gather form
# of compact_live_table, ~5 ms at 1M): a counting pass + ONE sequential
# Pallas pass that emits the live-first table directly.
#
#   - program c owns gaussians [c*CBLK, (c+1)*CBLK); their compacted
#     destinations start at live_start[c] (a tiny XLA cumsum of per-block
#     live counts, scalar-prefetched);
#   - in-block placement is a one-hot MXU matmul: member[d, s] =
#     (d == carry + rank_s) for live s, where rank is an exclusive
#     lane-cumsum of the live mask and carry = live_start[c] % 128 —
#     columns land anywhere in the [F_TBL, CSWIN] stage at matmul cost
#     (exact via the 3-limb trick: table ints < 2^24, member 0/1);
#   - writes go out in FULL 128-column groups at 128-aligned lane offsets
#     (Mosaic's alignment rule) — ngroups = (carry + k_c) // 128 is 0, 1 or
#     2, each a static-size DMA branch, so consecutive writes are DISJOINT
#     and never race; the sub-group remainder stays in the persistent VMEM
#     stage (rolled down by the written amount) as the next block's carry;
#   - unmatched stage columns are exact zeros = empty spans (excl == incl
#     == 0 never matches a slot), so dead/pad regions need no sentinel:
#     the output array is zero-prefilled via input_output_aliases and the
#     final sub-group flush masks the roll wraparound to zero.
#
# The compacted column order and values are IDENTICAL to the sort-based
# compact_live_table (stable live-first order, same per-column values), so
# expansion outputs are bitwise unchanged; only dead-column filler differs
# (total/total there, 0/0 here — both empty spans).
# --------------------------------------------------------------------------

CBLK = 256       # gaussians per compaction program
CPAD = 128       # output write granularity == GALIGN
CSWIN = CBLK + CPAD   # stage width: carry (<128) + block live (<=256)


def _lane_cumsum_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumsum along the lane axis of a [1, n] f32 row (Mosaic has
    no native cumsum; log-step masked rolls, render.py _scan_sub style)."""
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = x
    k = 1
    while k < n:
        shifted = pltpu.roll(y, shift=k, axis=1)
        y = y + jnp.where(lane >= k, shifted, 0.0)
        k *= 2
    return y - x


def _compact_kernel(live_start, tbl_hbm, zout_in, out_hbm, stage, buf,
                    wbuf, sem, wsem, *, nblocks: int):
    del zout_in  # aliased to out_hbm; zero prefill provides dead columns
    c = pl.program_id(0)

    def get_dma(slot, blk):
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(blk * CBLK, CBLK)],
            buf.at[slot], sem.at[slot])

    @pl.when(c == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(c + 1 < nblocks)
    def _():
        get_dma((c + 1) % 2, c + 1).start()

    get_dma(c % 2, c).wait()
    tblk = buf[c % 2]                                   # [F_TBL, CBLK]

    def block_geom(blk):
        ls = live_start[blk]
        k = live_start[blk + 1] - ls
        gb = pl.multiple_of((ls // CPAD) * CPAD, CPAD)
        return ls - gb, k, gb                            # carry, count, base

    carry, k_c, gb = block_geom(c)

    live = tblk[_R_INCL:_R_INCL + 1, :] > tblk[_R_EXCL:_R_EXCL + 1, :]
    rank = _lane_cumsum_excl(live.astype(jnp.float32))   # [1, CBLK] exact
    dst = jnp.where(live, rank.astype(jnp.int32) + carry, CSWIN)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (CSWIN, CBLK), 0)
    member = (d_iota == dst).astype(jnp.float32)         # [CSWIN, CBLK]
    if LIMB:
        v = jax.lax.dot_general(
            _limb3(tblk, 0), member,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [3*F_TBL, CSWIN]
        cols = v[:F_TBL] + v[F_TBL:2 * F_TBL] + v[2 * F_TBL:]
    else:
        cols = jax.lax.dot_general(
            tblk, member, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [F_TBL, CSWIN]

    lane = jax.lax.broadcasted_iota(jnp.int32, (F_TBL, CSWIN), 1)
    st = jnp.where(lane < carry, stage[...], 0.0) + cols

    ngroups = carry + k_c - (carry + k_c) % CPAD         # written columns

    def wdma(slot, base, width):
        return pltpu.make_async_copy(
            wbuf.at[slot, :, :width],
            out_hbm.at[:, pl.ds(base, width)], wsem.at[slot])

    # drain the write issued two blocks ago on this slot (disjoint ranges,
    # so only slot reuse needs serializing, not the writes themselves)
    s = c % 2

    @pl.when(c >= 2)
    def _():
        carry2, k2, gb2 = block_geom(c - 2)
        ng2 = carry2 + k2 - (carry2 + k2) % CPAD
        for w in (CPAD, 2 * CPAD):
            @pl.when(ng2 == w)
            def _():
                wdma(s, gb2, w).wait()

    wbuf[s] = st
    # next block's carry: the sub-group remainder, rolled down to lane 0
    # (static rolls selected by the scalar group count)
    st_r = jnp.where(ngroups == CPAD, pltpu.roll(st, CSWIN - CPAD, axis=1),
                     jnp.where(ngroups == 2 * CPAD,
                               pltpu.roll(st, CSWIN - 2 * CPAD, axis=1),
                               st))
    stage[...] = st_r

    for w in (CPAD, 2 * CPAD):
        @pl.when(ngroups == w)
        def _():
            wdma(s, gb, w).start()

    @pl.when(c == nblocks - 1)
    def _():
        # drain the previous block's write, flush the final sub-group
        # (masking the roll wraparound back to the zero sentinel), drain
        @pl.when(c >= 1)
        def _():
            carry1, k1, gb1 = block_geom(c - 1)
            ng1 = carry1 + k1 - (carry1 + k1) % CPAD
            for w in (CPAD, 2 * CPAD):
                @pl.when(ng1 == w)
                def _():
                    wdma((c - 1) % 2, gb1, w).wait()
        for w in (CPAD, 2 * CPAD):
            @pl.when(ngroups == w)
            def _():
                wdma(s, gb, w).wait()
        carry_end = carry + k_c - ngroups
        wbuf[s] = jnp.where(lane < carry_end, st_r, 0.0)
        fb = pl.multiple_of(gb + ngroups, CPAD)
        wdma(s, fb, CPAD).start()
        wdma(s, fb, CPAD).wait()


def compact_live_table_kernel(
        starts: jnp.ndarray, offsets: jnp.ndarray,
        rect_min: jnp.ndarray, rect_max: jnp.ndarray,
        depth_q: jnp.ndarray, capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Kernel-compacted expansion table -> (tbl, g_base, ok); same contract
    and bitwise-identical expansion outputs as compact_live_table.

    g_base/ok come from mapping window_starts' two searchsorteds on the
    ORIGINAL (sorted) start/offset arrays through the exclusive live-count
    cumsum L: the original arrays are non-decreasing with dead gaussians
    contributing flat runs, so #live with value </<= q equals L at the
    original boundary index — exactly the searchsorted result over the
    compacted arrays. The GW_COMPACT always-covers argument (module
    docstring) is unchanged."""
    n = starts.shape[0]
    tbl_u = build_table(starts, offsets, rect_min, rect_max, depth_q,
                        gw=GW_COMPACT)
    n_pad = tbl_u.shape[1]
    n_cpad = -(-n_pad // CBLK) * CBLK
    if n_cpad != n_pad:
        # extra pad columns are all-zero = empty spans (never match)
        tbl_u = jnp.concatenate(
            [tbl_u, jnp.zeros((F_TBL, n_cpad - n_pad), jnp.float32)],
            axis=1)
    nblocks = n_cpad // CBLK

    live = (offsets > starts).astype(jnp.int32)
    from ..binning import cumsum_mxu
    l_incl = cumsum_mxu(live)                            # [n]
    l_excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), l_incl])
    # live_start[c] = cumulative live count before block c = l_incl at the
    # previous block boundary (edge-padded past n: pad columns are dead)
    l_pad = jnp.pad(l_incl, (0, n_cpad - n), mode="edge")
    live_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), l_pad[CBLK - 1::CBLK]]).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_compact_kernel, nblocks=nblocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((F_TBL, CSWIN), jnp.float32),
                pltpu.VMEM((2, F_TBL, CBLK), jnp.float32),
                pltpu.VMEM((2, F_TBL, CSWIN), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((F_TBL, n_pad), jnp.float32),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=_interpret(),
    )(live_start, tbl_u, jnp.zeros((F_TBL, n_pad), jnp.float32))

    # window bounds over the compacted table via the L map
    nbq = capacity // BLK
    total = offsets[-1]
    qs = jnp.arange(nbq, dtype=jnp.int32) * BLK
    j_lo = jnp.searchsorted(offsets, qs, side="right").astype(jnp.int32)
    j_hi = jnp.searchsorted(starts, jnp.minimum(qs + BLK, total),
                            side="left").astype(jnp.int32)
    j_lo = jax.lax.optimization_barrier(j_lo)
    j_hi = jax.lax.optimization_barrier(j_hi)
    le = jax.lax.optimization_barrier(l_excl)
    g_lo = le[j_lo]
    g_hi = le[j_hi]
    base = jnp.clip((g_lo // GALIGN) * GALIGN, 0, n_pad - GW_COMPACT)
    ok = jnp.all(g_hi <= base + GW_COMPACT)
    return out, base, ok


def expand_pallas(tbl: jnp.ndarray, g_base: jnp.ndarray, capacity: int,
                  grid_x: int, d_bits: int, num_tiles: int,
                  gw: int = GW) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (key [capacity] u32, gid [capacity] i32) in presort order."""
    assert capacity % BLK == 0
    nblocks = capacity // BLK
    kernel = functools.partial(_expand_kernel, grid_x=grid_x, d_bits=d_bits,
                               num_tiles=num_tiles, nblocks=nblocks, gw=gw)
    key, gid = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                # unit middle axis: the VMEM block's trailing dims must
                # equal the array's trailing dims (Mosaic block rule)
                pl.BlockSpec((1, 1, BLK), lambda c, *_: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BLK), lambda c, *_: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, F_TBL, gw), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 1, BLK), jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, 1, BLK), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(g_base, tbl)
    return key.reshape(capacity), gid.reshape(capacity)
