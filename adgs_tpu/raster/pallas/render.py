"""Pallas compositing kernels (forward + hand-derived backward).

Replaces the scan-over-all-tiles XLA path (raster/tiled.py) with one grid
program per 16x16 tile that loops over exactly ITS depth-sorted instance
range (scalar-prefetched [start, count]), DMA-ing fixed-size instance blocks
from HBM — the TPU analog of renderCUDA's shared-memory staging
(forward.cu:302-332). Early termination when every pixel in the tile is
saturated mirrors the block-wide vote (forward.cu:308-310).

Register layout (chosen so no transposes occur in the hot loop):
  - instance blocks: [F, CHUNK] — rows are geometry/feature components,
    CHUNK instances on lanes;
  - alpha/weights: [P, CHUNK] — P=256 tile pixels on sublanes;
  - per-pixel accumulators: [CHo, P] produced by
    dot(feats [CHo,CHUNK], w [P,CHUNK], contract lanes) on the MXU.

The backward runs the SAME front-to-back replay (no back-to-front pass,
no atomics): with b_j = w_j * (f_j . g) and A = sum_k b_k,
  dL/dalpha_j = T_j (f_j . g) - (A - prefixincl_j(b)) / (1 - alpha_j)
               + g_T * T_final / (1 - alpha_j)
which needs only running prefix sums (cumsum on lanes + a carry), then
per-instance gradient rows are DMA'd to disjoint [*, R] slices (tiles own
disjoint instance ranges — deterministic, race-free by construction) and
segment-summed per Gaussian outside the kernel. Equivalent math to
backward.cu:417-646 including the accumulated-opacity path (:612) and the
background term via the final-T cotangent (:620-623).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..binning import Binning
from ..types import RasterSettings, TILE_X, TILE_Y, TILE_PIX

CHUNK = 256          # instances per DMA block
P = TILE_PIX         # 256 pixels per tile


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests); compiled on real hardware."""
    return jax.default_backend() != "tpu"
LOG_TEPS = float(np.log(1e-4))
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99

# geometry rows in the instance buffer
_G_MX, _G_MY, _G_CA, _G_CB, _G_CC, _G_OP = 0, 1, 2, 3, 4, 5
F_GEOM = 8  # padded to a sublane tile


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def pack_gaussian_rows(mean2d, conic, opacity, features):
    """[N, F] per-Gaussian row matrix (differentiable concat; F = 8 geometry
    columns + features padded to a multiple of 8)."""
    n = mean2d.shape[0]
    ch = features.shape[-1]
    F = F_GEOM + _round8(ch)
    cols = [mean2d, conic, opacity[:, None],
            jnp.zeros((n, 2), jnp.float32), features]
    extra = F - F_GEOM - ch
    if extra:
        cols.append(jnp.zeros((n, extra), jnp.float32))
    return jnp.concatenate(cols, axis=-1), F


def build_aligned_instances(gauss_id, valid, tile_id, tile_start, tile_count,
                            packed, num_tiles: int):
    """Scatter the depth-sorted instance list into a layout where every
    tile's range starts at a CHUNK-aligned offset (Mosaic requires provably
    lane-tile-aligned dynamic DMA starts), then gather the per-Gaussian rows
    in ONE row gather and lay them out feature-major for the kernel.

    Returns (inst [F, R_a + CHUNK], gid_aligned [R_a], ok [R_a],
    aligned_start [T])."""
    R = gauss_id.shape[0]
    cap = R + num_tiles * CHUNK
    padded = -(-tile_count // CHUNK) * CHUNK
    ends = jnp.cumsum(padded)
    astart = (ends - padded).astype(jnp.int32)

    r = jnp.arange(R, dtype=jnp.int32)
    t_c = jnp.clip(tile_id, 0, num_tiles - 1)
    local = r - tile_start[t_c]
    dest = jnp.where(valid, astart[t_c] + local, cap)
    gid_a = jnp.zeros(cap, jnp.int32).at[dest].set(gauss_id, mode="drop")
    ok = jnp.zeros(cap, bool).at[dest].set(True, mode="drop")

    # barriers keep the gather/scatter ops on their fast standalone paths
    # (fused into elementwise ops they scalarize; see binning.py)
    gid_a = jax.lax.optimization_barrier(gid_a)
    rows = jax.lax.optimization_barrier(packed[gid_a])  # [R_a, F] row gather
    rows = jnp.where(ok[:, None], rows, 0.0)    # dead slots: alpha-gated out
    inst = rows.T                               # [F, R_a]
    pad = jnp.zeros((inst.shape[0], CHUNK), dtype=jnp.float32)
    return jnp.concatenate([inst, pad], axis=1), gid_a, ok, astart


def _tile_pixels(i, grid_x: int):
    """[P, 1] absolute pixel x and y for tile i."""
    tx = (i % grid_x) * TILE_X
    ty = (i // grid_x) * TILE_Y
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx + pix % TILE_X).astype(jnp.float32)
    py = (ty + pix // TILE_X).astype(jnp.float32)
    return px, py


def _alpha_block(geom, px, py, valid_lanes):
    """[P, CHUNK] gated alpha from one instance block ([F, CHUNK])."""
    mx = geom[_G_MX:_G_MX + 1, :]
    my = geom[_G_MY:_G_MY + 1, :]
    ca = geom[_G_CA:_G_CA + 1, :]
    cb = geom[_G_CB:_G_CB + 1, :]
    cc = geom[_G_CC:_G_CC + 1, :]
    op = geom[_G_OP:_G_OP + 1, :]
    dx = mx - px            # [P, CHUNK]
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    gate = (power > 0.0) | (alpha < ALPHA_MIN) | jnp.logical_not(valid_lanes)
    return jnp.where(gate, 0.0, alpha)


def _lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last (lane) axis via log-step rolls —
    Mosaic has no native cumsum. O(log n) rotate+add steps."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, shift=k, axis=x.ndim - 1)
        x = x + jnp.where(lane >= k, shifted, 0.0)
        k *= 2
    return x


def _chunk_weights(alpha, log_t_raw, log_t_eff):
    """Replicates composite.blend_weights for one block in log space.

    alpha: [P, CHUNK]; carries: [P, 1]. Returns (w, new_raw, new_eff,
    log_t_excl_eff) with include = raw running product >= 1e-4."""
    log1m = jnp.log1p(-alpha)
    cum_raw = _lane_cumsum(log1m) + log_t_raw
    include = (cum_raw >= LOG_TEPS) & (log_t_raw >= LOG_TEPS)
    a_eff = jnp.where(include, alpha, 0.0)
    log1m_eff = jnp.log1p(-a_eff)
    cum_eff = _lane_cumsum(log1m_eff) + log_t_eff
    log_t_excl = cum_eff - log1m_eff
    w = a_eff * jnp.exp(log_t_excl)
    return w, cum_raw[:, -1:], cum_eff[:, -1:], (a_eff, log_t_excl, include)


def _fwd_kernel(tile_start, tile_count, inst_hbm, out_ref,
                buf, sem, *, grid_x: int, ch: int, f_rows: int):
    i = pl.program_id(0)
    start = pl.multiple_of(tile_start[i], CHUNK)
    cnt = tile_count[i]
    px, py = _tile_pixels(i, grid_x)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    nchunks = pl.cdiv(cnt, CHUNK)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        c, log_t_raw, _, _ = state
        return (c < nchunks) & (jnp.max(log_t_raw) >= LOG_TEPS)

    def body(state):
        c, log_t_raw, log_t_eff, accum = state

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(c % 2, c).wait()
        geom = buf[c % 2]
        valid = lane < (cnt - c * CHUNK)
        alpha = _alpha_block(geom, px, py, valid)
        w, log_t_raw, log_t_eff, _ = _chunk_weights(alpha, log_t_raw,
                                                    log_t_eff)
        feats = geom[F_GEOM:F_GEOM + ch, :]          # [CHo, CHUNK]
        accum = accum + jax.lax.dot_general(
            feats, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [CHo, P]
        return c + 1, log_t_raw, log_t_eff, accum

    init = (jnp.int32(0),
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((ch, P), jnp.float32))
    c_end, _, log_t_eff, accum = jax.lax.while_loop(cond, body, init)

    # early exit leaves one prefetched DMA in flight; drain it so the
    # scratch semaphore is clean for the next grid step
    @pl.when(c_end < nchunks)
    def _():
        get_dma(c_end % 2, c_end).wait()

    out_ref[0, :ch, :] = accum
    out_ref[0, ch:ch + 1, :] = jnp.exp(log_t_eff).reshape(1, P)


def _bwd_kernel(tile_start, tile_count, inst_hbm, zgrad_in, g_ref, blend_ref,
                grad_hbm, buf, gbuf, sem, wsem, *,
                grid_x: int, ch: int, f_rows: int, g_rows: int):
    del zgrad_in  # aliased to grad_hbm; zeros provide the init
    i = pl.program_id(0)
    start = pl.multiple_of(tile_start[i], CHUNK)
    cnt = tile_count[i]
    px, py = _tile_pixels(i, grid_x)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    g = g_ref[0]                   # [CH+1, P] cotangents (features + final_t)
    blended = blend_ref[0]         # [CH+1, P] forward outputs
    t_final = blended[ch:ch + 1, :]          # [1, P]
    g_t = g[ch:ch + 1, :]                    # [1, P]
    # A = sum_k b_k  per pixel: sum over channels of blended*g
    a_dot_g = jnp.sum(blended[:ch, :] * g[:ch, :], axis=0, keepdims=True)
    a_dot_g_col = a_dot_g.reshape(P, 1)      # [1,P] -> [P,1] relayout
    gt_tfin_col = (g_t * t_final).reshape(P, 1)

    nchunks = pl.cdiv(cnt, CHUNK)

    def cond(state):
        c, log_t_raw, _, _ = state
        return (c < nchunks) & (jnp.max(log_t_raw) >= LOG_TEPS)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(state):
        c, log_t_raw, log_t_eff, prefix = state

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(c % 2, c).wait()
        geom = buf[c % 2]
        valid = lane < (cnt - c * CHUNK)
        alpha = _alpha_block(geom, px, py, valid)
        w, new_raw, new_eff, (a_eff, log_t_excl, include) = _chunk_weights(
            alpha, log_t_raw, log_t_eff)

        feats = geom[F_GEOM:F_GEOM + ch, :]
        # fg[j, pix] = f_j . g  -> [P, CHUNK]
        fg = jax.lax.dot_general(
            g[:ch, :], feats, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(P, CHUNK)
        b = w * fg
        prefix_incl = _lane_cumsum(b) + prefix
        t_excl = jnp.exp(log_t_excl)
        inv1m = 1.0 / (1.0 - a_eff)
        # dT_final/dalpha_j = -T_final/(1-alpha_j): the kernel's T output
        # is the transmittance itself (the wrapper forms opacity = 1 - T)
        d_alpha = (t_excl * fg
                   - (a_dot_g_col - prefix_incl) * inv1m
                   - gt_tfin_col * inv1m)
        d_alpha = jnp.where(include & (alpha > 0.0), d_alpha, 0.0)

        # chain to instance params (zero where the 0.99 clamp was active)
        op = geom[_G_OP:_G_OP + 1, :]
        mx = geom[_G_MX:_G_MX + 1, :]
        my = geom[_G_MY:_G_MY + 1, :]
        ca = geom[_G_CA:_G_CA + 1, :]
        cb = geom[_G_CB:_G_CB + 1, :]
        cc = geom[_G_CC:_G_CC + 1, :]
        dx = mx - px
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        G = jnp.exp(power)
        unclamped = (op * G) < ALPHA_MAX
        d_alpha_free = jnp.where(unclamped, d_alpha, 0.0)
        d_op = jnp.sum(d_alpha_free * G, axis=0, keepdims=True)  # [1, CHUNK]
        d_power = d_alpha_free * op * G                          # [P, CHUNK]
        d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        d_cb = jnp.sum(d_power * (-dx * dy), axis=0, keepdims=True)
        d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=0, keepdims=True)
        d_mx = jnp.sum(d_power * (-(ca * dx + cb * dy)), axis=0, keepdims=True)
        d_my = jnp.sum(d_power * (-(cc * dy + cb * dx)), axis=0, keepdims=True)
        # dL/df_j = sum_pix w * g_ch  -> [CHo, CHUNK]
        d_feat = jax.lax.dot_general(
            g[:ch, :], w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        grows = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_feat], axis=0)
        pad_rows = g_rows - grows.shape[0]
        if pad_rows > 0:
            grows = jnp.concatenate(
                [grows, jnp.zeros((pad_rows, CHUNK), jnp.float32)], axis=0)
        gbuf[...] = grows
        wr = pltpu.make_async_copy(
            gbuf, grad_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)], wsem)
        wr.start()
        wr.wait()
        return c + 1, new_raw, new_eff, prefix_incl[:, -1:]

    init = (jnp.int32(0),
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32))
    c_end, _, _, _ = jax.lax.while_loop(cond, body, init)

    @pl.when(c_end < nchunks)
    def _():
        get_dma(c_end % 2, c_end).wait()


SEG_BLK = 512    # gaussians per segment-reduce program
SEG_C = 512      # sorted instances per DMA chunk


def _segreduce_kernel(blk_start, rows_hbm, out_ref, buf, sem, *,
                      g_rows: int, n_blocks: int):
    """Per-Gaussian reduction over gid-SORTED instance rows, scatter-free.

    rows_hbm: [g_rows+8, R_sorted] where the row at index g_rows holds the
    (exact-in-f32) gaussian id of each sorted instance. Program b reduces
    gaussians [b*SEG_BLK, (b+1)*SEG_BLK): it walks its instances' chunk
    range and accumulates via a one-hot MATMUL — rows [G, C] x onehot
    [BLK, C]^T -> [G, BLK] on the MXU. Chunk starts are rounded down to the
    lane tile; out-of-block instances fall outside the one-hot and vanish,
    which also makes the DMA alignment exact."""
    b = pl.program_id(0)
    start = blk_start[b]
    end = blk_start[b + 1]
    start_al = pl.multiple_of((start // SEG_C) * SEG_C, SEG_C)
    nchunks = pl.cdiv(end - start_al, SEG_C)

    base_gid = (b * SEG_BLK).astype(jnp.float32)
    blk_iota = jax.lax.broadcasted_iota(
        jnp.int32, (SEG_BLK, 1), 0).astype(jnp.float32) + base_gid

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(start_al + c * SEG_C, SEG_C)],
            buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(c, accum):
        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()
        get_dma(c % 2, c).wait()
        chunk = buf[c % 2]
        gid_row = chunk[g_rows:g_rows + 1, :]          # [1, C] f32 ids
        onehot = (blk_iota == gid_row).astype(jnp.float32)  # [BLK, C]
        return accum + jax.lax.dot_general(
            chunk[:g_rows, :], onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [G, BLK]

    accum = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((g_rows, SEG_BLK), jnp.float32))
    out_ref[...] = accum


def segment_reduce_pallas(rows: jnp.ndarray, gid: jnp.ndarray,
                          n_gauss: int) -> jnp.ndarray:
    """[G, R] per-instance rows + [R] gaussian ids -> [G, n_gauss] sums.

    Scatter-free replacement for per-row segment_sum (TPU scatter-add runs
    at ~500 MB/s; this sorts once and reduces on the MXU)."""
    g_rows, R = rows.shape
    perm = jnp.argsort(gid)
    gid_sorted = gid[perm]
    # per-row lane-layout gathers: one fused [R, G] gather materializes a
    # transposed-minor layout and profiles ~10x slower. Barriers must wrap
    # the gather INPUTS — a slice fused into the gather operand pushes it
    # off the fast path just as badly (profiled 16ms/row vs 0.1ms).
    perm = jax.lax.optimization_barrier(perm)
    row_list = [jax.lax.optimization_barrier(rows[i]) for i in range(g_rows)]
    rows_sorted = jnp.stack(
        [jax.lax.optimization_barrier(r[perm]) for r in row_list]
        + [gid_sorted.astype(jnp.float32)], axis=0)
    # pad rows to a sublane tile and columns by a chunk
    g_pad = _round8(g_rows + 1) - (g_rows + 1)
    if g_pad:
        rows_sorted = jnp.concatenate(
            [rows_sorted, jnp.zeros((g_pad, R), jnp.float32)], axis=0)
    rows_sorted = jnp.concatenate(
        [rows_sorted, jnp.zeros((rows_sorted.shape[0], SEG_C), jnp.float32)
         .at[g_rows].set(-1.0)], axis=1)

    n_blocks = -(-n_gauss // SEG_BLK)
    bounds = jnp.searchsorted(
        gid_sorted, jnp.arange(0, (n_blocks + 1) * SEG_BLK, SEG_BLK,
                               dtype=jnp.int32)).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_segreduce_kernel, g_rows=g_rows,
                          n_blocks=n_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((g_rows, SEG_BLK), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, rows_sorted.shape[0], SEG_C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((g_rows, n_blocks * SEG_BLK),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(bounds, rows_sorted)
    return out[:, :n_gauss]


class _CompositeOut(NamedTuple):
    blended: jnp.ndarray   # [T, CH, P]
    final_t: jnp.ndarray   # [T, P]


def _fwd_call(inst, F, tile_start, tile_count, num_tiles, grid_x, ch):
    kernel = functools.partial(_fwd_kernel, grid_x=grid_x, ch=ch, f_rows=F)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, ch + 1, P), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, F, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, ch + 1, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(tile_start, tile_count, inst)
    return out


def _bwd_call(inst, F, tile_start, tile_count, g_all, blended_all,
              num_tiles, grid_x, ch, R_pad):
    g_rows = _round8(F_GEOM - 2 + ch)  # 6 geom grads + feat grads, padded
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, ch=ch, f_rows=F,
                               g_rows=g_rows)
    grad_inst = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, ch + 1, P), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ch + 1, P), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, F, CHUNK), jnp.float32),
                pltpu.VMEM((g_rows, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((g_rows, R_pad), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=_interpret(),
    )(tile_start, tile_count, inst,
      jnp.zeros((g_rows, R_pad), jnp.float32), g_all, blended_all)
    return grad_inst


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def composite_pallas(mean2d, conic, opacity, features,
                     gauss_id, inst_valid, tile_info,
                     num_tiles, grid_x):
    """tile_info = (tile_id [R] sorted, tile_start [T], tile_count [T])."""
    out, _ = _composite_fwd(mean2d, conic, opacity, features, gauss_id,
                            inst_valid, tile_info, num_tiles, grid_x)
    return out


def _composite_fwd(mean2d, conic, opacity, features, gauss_id, inst_valid,
                   tile_info, num_tiles, grid_x):
    ch = features.shape[-1]
    packed, F = pack_gaussian_rows(mean2d, conic, opacity, features)
    inst, gid_a, ok, astart = build_aligned_instances(
        gauss_id, inst_valid, tile_info[0], tile_info[1], tile_info[2],
        packed, num_tiles)
    out = _fwd_call(inst, F, astart, tile_info[2], num_tiles, grid_x, ch)
    result = _CompositeOut(blended=out[:, :ch, :], final_t=out[:, ch, :])
    residuals = (inst, F, out, gid_a, astart, tile_info,
                 mean2d.shape[0], ch)
    return result, residuals


def _composite_bwd(num_tiles, grid_x, residuals, g):
    inst, F, out, gid_a, astart, tile_info, n_gauss, ch = residuals
    R_pad = inst.shape[1]
    R_a = gid_a.shape[0]
    g_all = jnp.concatenate([g.blended, g.final_t[:, None, :]], axis=1)
    grad_inst = _bwd_call(inst, F, astart, tile_info[2], g_all,
                          out, num_tiles, grid_x, ch, R_pad)
    # deterministic per-Gaussian reduction over duplicated instances via
    # the scatter-free sorted one-hot-matmul kernel (TPU scatter-add is
    # ~500 MB/s; this runs at sort+gather+MXU speed)
    per = segment_reduce_pallas(grad_inst[:6 + ch, :R_a], gid_a, n_gauss)
    d_mean2d = jnp.stack([per[0], per[1]], axis=-1)
    d_conic = jnp.stack([per[2], per[3], per[4]], axis=-1)
    d_opacity = per[5]
    d_feat = jnp.stack([per[6 + c] for c in range(ch)], axis=-1)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)  # noqa: E731
    zero_t = (f0(tile_info[0]), f0(tile_info[1]), f0(tile_info[2]))
    return (d_mean2d, d_conic, d_opacity, d_feat,
            f0(tile_info[0]), f0(tile_info[0]), zero_t)


composite_pallas.defvjp(_composite_fwd, _composite_bwd)


# ---------------------------------------------------------------------------
# public entry: same surface as tiled.render_tiled
# ---------------------------------------------------------------------------

def render_pallas(prep, binning: Binning, settings: RasterSettings,
                  flow_points: Optional[jnp.ndarray] = None,
                  semantic: Optional[jnp.ndarray] = None):
    from .. import composite as composite_mod
    from ..tiled import tiles_to_image
    from ..types import RasterOutput

    feats = [prep.rgb, composite_mod.depth_feature(
        prep.depth, settings.inv_depth)[:, None]]
    if flow_points is not None:
        feats.append(flow_points)
    if semantic is not None:
        feats.append(semantic)
    features = jnp.concatenate(feats, axis=-1)
    opac = jnp.where(prep.visible, prep.opacity, 0.0)

    out = composite_pallas(
        prep.mean2d, prep.conic, opac, features,
        jax.lax.stop_gradient(binning.gauss_id),
        jax.lax.stop_gradient(binning.valid),
        (jax.lax.stop_gradient(binning.tile_id),
         jax.lax.stop_gradient(binning.tile_start),
         jax.lax.stop_gradient(binning.tile_count)),
        settings.num_tiles, settings.grid_x)

    blended = jnp.transpose(out.blended, (0, 2, 1))    # [T, P, CH]
    t_final = out.final_t                              # [T, P]

    color_t = blended[..., :3] + t_final[..., None] * settings.bg
    color = tiles_to_image(color_t, settings)
    depth = tiles_to_image(blended[..., 3:4], settings)
    opacity = tiles_to_image(1.0 - t_final[..., None], settings)
    chc = 4
    flow_img = sem_img = None
    if flow_points is not None:
        flow_img = tiles_to_image(blended[..., chc:chc + 3], settings)
        chc += 3
    if semantic is not None:
        S = semantic.shape[-1]
        sem_img = tiles_to_image(blended[..., chc:chc + S], settings)

    return RasterOutput(color=color, radii=prep.radii.astype(jnp.int32),
                        depth=depth, opacity=opacity, flow=flow_img,
                        semantic=sem_img)
