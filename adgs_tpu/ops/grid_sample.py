"""Blocked Pallas bilinear grid sampling for image-shaped coordinate
fields (the environment-map hot path).

The generic grid sample (models/env_map.py) costs ~19ms forward (4
row gathers from the 800MB 8192^2 grid) and ~60ms backward (flat
1D scatter-adds) per frame. For IMAGE-SHAPED coords the mapping
pixel -> env cell is smooth, so an [BH x BW]-pixel block's bilinear
taps live in a small [WH x WW] window of the grid. Within a window the
2D cell one-hot factorizes into row/column one-hots:

    out[c, t]  = sum_{ly,lx} win[c,ly,lx] * Y[ly,t] * X[lx,t]
    d_win[c]   = sum_t (Y . (w*g_c))[:, t] (x) X[:, t]
               = (Y . (w*g_c)) @ X^T        -- one MXU matmul per tap/ch

so the forward becomes window matmuls instead of gathers, and the
backward window matmuls + read-modify-write window DMAs instead of
scatters. Blocks whose footprint exceeds the static window (azimuth
seam, poles, extreme fov) flip a flag and the caller falls back to the
generic path via lax.cond — the same guard pattern as the binning
expander (raster/pallas/expand.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# backward window-run accumulation (see _bwd_kernel); module-level so the
# A/B lab (exp/lab_envbwd.py) can flip it and re-jit
ACCUM_RUNS = True

# limb-split the float operand of the tap dots: the one-hot tap matrices
# are EXACT in bf16, so 3 DEFAULT-precision passes reproduce the f32
# product to ~2^-25 relative where HIGHEST costs 6 passes (same trick as
# raster/pallas/render.py LIMB; helpers duplicated to keep ops/ free of
# raster deps). Flip for A/B via exp/lab_gslimb.py.
GS_LIMB = True


def _limb3(x, axis: int):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([hi, mid, rem - mid], axis=axis)


def _limb_fold(y, n: int):
    return y[:n] + y[n:2 * n] + y[2 * n:]


def _tap_dot(a, b, dims):
    """dot_general(a_float, b_exact_bf16) — limb-split tier when enabled.
    The limbed axis is a's axis 0 (must not be a contracting dim)."""
    if not GS_LIMB:
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    n = a.shape[0]
    out = jax.lax.dot_general(_limb3(a, 0), b, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    return _limb_fold(out, n)


BH = 8      # pixels per block, rows
BW = 32     # pixels per block, cols
WH = 48     # window rows (multiple of 8): KITTI's 707px-focal cameras
#             span ~30 elevation cells per 8-px block at the 8192 grid,
#             plus up to 7 rows of sublane-alignment slack
WW = 256    # window cols (multiple of 128): ~59 azimuth cells per
#             32-px block + up to 127 lanes of alignment slack
P = BH * BW  # 256 pixels -> 4*P bilinear taps per block


def _block_reduce(a, nby, nbx, fn):
    return fn(a.reshape(4, nby, BH, nbx, BW), axis=(0, 2, 4))


def _block_meta(yi4, xi4, Hg, Wg, nby, nbx):
    """Aligned per-block window starts + the whole-frame coverage flag.

    The azimuth axis WRAPS: a block of rays straddling the +-pi seam taps
    columns {0..k} u {Wg-m..Wg-1} — a raw min/max window can never cover
    it (span ~Wg), which used to fail the WHOLE frame over a handful of
    seam blocks (any camera looking near azimuth pi). Such blocks get a
    window start derived from half-grid-shifted extents; the kernels DMA
    window columns modulo Wg (128-lane pieces, each start stays aligned
    because Wg % 128 == 0) and match one-hots on (xi - x0) mod Wg."""
    y_lo = _block_reduce(yi4, nby, nbx, jnp.min)
    y_hi = _block_reduce(yi4, nby, nbx, jnp.max)
    y0 = jnp.clip((y_lo // 8) * 8, 0, Hg - WH)
    ok_y = (y_hi < y0 + WH) & (y_lo >= y0)

    x_lo = _block_reduce(xi4, nby, nbx, jnp.min)
    x_hi = _block_reduce(xi4, nby, nbx, jnp.max)
    x0r = (x_lo // 128) * 128
    fit_r = x_hi < x0r + WW          # contiguous window (may wrap its tail)
    half = (Wg // 2 // 128) * 128    # 128-aligned half-grid shift
    xs4 = jnp.where(xi4 >= half, xi4 - half, xi4 + (Wg - half))
    xs_lo = _block_reduce(xs4, nby, nbx, jnp.min)
    xs_hi = _block_reduce(xs4, nby, nbx, jnp.max)
    xs0 = (xs_lo // 128) * 128
    fit_s = xs_hi < xs0 + WW
    x0s = jnp.where(xs0 + half >= Wg, xs0 + half - Wg, xs0 + half)
    x0 = jnp.where(fit_r, x0r, x0s)
    ok_b = ok_y & (fit_r | fit_s)
    return y0.reshape(-1), x0.reshape(-1), ok_b.reshape(-1)


def _blocked(a, nby, nbx):
    """[K, Hp, Wp] -> [nb, K, P] (pixel-major within each block)."""
    K = a.shape[0]
    return (a.reshape(K, nby, BH, nbx, BW)
            .transpose(1, 3, 0, 2, 4).reshape(nby * nbx, K, P))


def _onehots(xi_ref, yi_ref, y0, x0, t, Wg):
    iot_h = jax.lax.broadcasted_iota(jnp.int32, (WH, P), 0)
    iot_w = jax.lax.broadcasted_iota(jnp.int32, (WW, P), 0)
    ly = yi_ref[0, t].reshape(1, P) - y0
    # azimuth wraps: window column of tap xi is (xi - x0) mod Wg
    lx = xi_ref[0, t].reshape(1, P) - x0
    lx = jnp.where(lx < 0, lx + Wg, lx)
    Y = (iot_h == ly).astype(jnp.float32)     # [WH, P]
    X = (iot_w == lx).astype(jnp.float32)     # [WW, P]
    return Y, X


_NCOL = WW // 128   # window column pieces (wrap-capable DMAs)
MAXBAD = 64         # residual-patched uncoverable blocks per frame


def _bad_blocks(ok_b):
    """(bad_idx [MB], valid [MB]), MB = min(MAXBAD, nb): ids of the first
    blocks whose window cannot cover their taps (stable order)."""
    nb = ok_b.shape[0]
    mb = min(MAXBAD, nb)
    order = jnp.argsort(ok_b.astype(jnp.int32), stable=True)  # bad first
    bad_idx = order[:mb]
    valid = jnp.arange(mb) < jnp.sum(~ok_b)
    return jnp.where(valid, bad_idx, nb), valid


def _residual_fwd(grid, xi_b, yi_b, w_b, bad_idx, valid):
    """Direct bilinear sums for the residual blocks: [MAXBAD, C, P]."""
    C, Hg, Wg = grid.shape
    safe = jnp.minimum(bad_idx, xi_b.shape[0] - 1)
    xi = xi_b[safe]                                   # [MB, 4, P]
    yi = yi_b[safe]
    w = w_b[safe]
    mb = xi.shape[0]
    flat = (yi * Wg + xi).reshape(-1)                 # [MB*4*P]
    flat = jax.lax.optimization_barrier(flat)
    vals = grid.reshape(C, -1)[:, flat]               # [C, MB*4*P]
    vals = vals.reshape(C, mb, 4, P)
    out = jnp.einsum("cmtp,mtp->mcp", vals, w,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.where(valid[:, None, None], out, 0.0)


def _residual_bwd(g_b, grid_shape, xi_b, yi_b, w_b, bad_idx, valid):
    """Scatter-add the residual blocks' cotangents: [C, Hg, Wg]."""
    C, Hg, Wg = grid_shape
    nb = g_b.shape[0]
    safe = jnp.minimum(bad_idx, xi_b.shape[0] - 1)
    xi = xi_b[safe]
    yi = yi_b[safe]
    w = w_b[safe]
    g_bad = g_b[jnp.minimum(bad_idx, nb - 1)]         # [MB, C, P]
    flat = (yi * Wg + xi).reshape(-1)
    flat = jnp.where(jnp.repeat(valid, 4 * P), flat, Hg * Wg)  # drop pad
    vals = jnp.einsum("mcp,mtp->cmtp", g_bad, w,
                      precision=jax.lax.Precision.HIGHEST).reshape(C, -1)
    chans = [jnp.zeros((Hg * Wg,), jnp.float32).at[flat].add(
        vals[c], mode="drop") for c in range(C)]
    return jnp.stack(chans).reshape(C, Hg, Wg)


def _wrap_col(x0, j, Wg):
    xj = x0 + j * 128
    return pl.multiple_of(jnp.where(xj >= Wg, xj - Wg, xj), 128)


def _fwd_kernel(y0s, x0s, xi_ref, yi_ref, w_ref, grid_hbm, out_ref,
                buf, sem, *, C: int, nb: int, Wg: int):
    b = pl.program_id(0)
    y0 = y0s[b]
    x0 = x0s[b]

    def get_dmas(slot, bb):
        # the window may straddle the azimuth seam: copy it as _NCOL
        # 128-lane pieces whose grid columns wrap modulo Wg (every start
        # stays 128-aligned because Wg % 128 == 0)
        return [pltpu.make_async_copy(
            grid_hbm.at[:, pl.ds(pl.multiple_of(y0s[bb], 8), WH),
                        pl.ds(_wrap_col(x0s[bb], j, Wg), 128)],
            buf.at[slot, :, :, j * 128:(j + 1) * 128], sem.at[slot, j])
            for j in range(_NCOL)]

    @pl.when(b == 0)
    def _():
        for d in get_dmas(0, 0):
            d.start()

    @pl.when(b + 1 < nb)
    def _():
        for d in get_dmas((b + 1) % 2, b + 1):
            d.start()

    for d in get_dmas(b % 2, b):
        d.wait()
    win = buf[b % 2]                                  # [C, WH, WW]

    for c in range(C):
        acc = jnp.zeros((1, P), jnp.float32)
        for t in range(4):
            Y, X = _onehots(xi_ref, yi_ref, y0, x0, t, Wg)
            w = w_ref[0, t].reshape(1, P)
            tmp = _tap_dot(
                win[c], X, (((1,), (0,)), ((), ())))   # [WH, P]
            acc = acc + jnp.sum(Y * tmp, axis=0, keepdims=True) * w
        out_ref[0, c] = acc[0]


def _bwd_kernel(y0s, x0s, xi_ref, yi_ref, w_ref, g_ref, zeros_in, grid_hbm,
                buf, rsem, wsem, *, C: int, nb: int, Wg: int,
                accum_runs: bool = True):
    del zeros_in  # aliased to grid_hbm; provides the zero init
    b = pl.program_id(0)
    y0 = y0s[b]
    x0 = x0s[b]
    # consecutive raster-order blocks usually share the SAME 128-aligned
    # window (a 32-px block spans ~60 azimuth cells vs the 256-cell
    # window): accumulate in VMEM across the run and flush only when the
    # window changes — cuts the serialized read-modify-write DMA chains
    # (the whole cost of this kernel; the matmuls are ~10%) by the
    # sharing factor (~2-4x on KITTI-shaped frames). accum_runs=False
    # restores the strict per-block RMW (A/B vehicle, exp/lab_envbwd.py).
    runs = jnp.bool_(accum_runs)
    same_prev = runs & jnp.logical_and(
        b > 0,
        jnp.logical_and(y0s[jnp.maximum(b - 1, 0)] == y0,
                        x0s[jnp.maximum(b - 1, 0)] == x0))
    same_next = runs & jnp.logical_and(
        b + 1 < nb,
        jnp.logical_and(y0s[jnp.minimum(b + 1, nb - 1)] == y0,
                        x0s[jnp.minimum(b + 1, nb - 1)] == x0))

    def col_dmas(vmem_to_hbm: bool, sems):
        out = []
        for j in range(_NCOL):
            hbm = grid_hbm.at[:, pl.ds(pl.multiple_of(y0s[b], 8), WH),
                              pl.ds(_wrap_col(x0s[b], j, Wg), 128)]
            vm = buf.at[:, :, j * 128:(j + 1) * 128]
            out.append(pltpu.make_async_copy(
                vm if vmem_to_hbm else hbm,
                hbm if vmem_to_hbm else vm, sems.at[j]))
        return out

    # strict read-modify-write at window-run boundaries: different-window
    # neighbours may still overlap (also through the azimuth wrap) and the
    # grid is sequential, so a run's first read must see the previous
    # run's write — guaranteed by the write wait in the flushing program.
    reads = col_dmas(False, rsem)

    @pl.when(jnp.logical_not(same_prev))
    def _():
        for d in reads:
            d.start()

    adds = []
    for c in range(C):
        g_c = g_ref[0, c].reshape(1, P)
        acc = jnp.zeros((WH, WW), jnp.float32)
        for t in range(4):
            Y, X = _onehots(xi_ref, yi_ref, y0, x0, t, Wg)
            w = w_ref[0, t].reshape(1, P)
            A = Y * (w * g_c)                        # [WH, P]
            acc = acc + _tap_dot(
                A, X, (((1,), (1,)), ((), ())))      # [WH, WW]
        adds.append(acc)

    @pl.when(jnp.logical_not(same_prev))
    def _():
        for d in reads:
            d.wait()

    for c in range(C):
        buf[c] += adds[c]

    @pl.when(jnp.logical_not(same_next))
    def _():
        writes = col_dmas(True, wsem)
        for d in writes:
            d.start()
        for d in writes:
            d.wait()


def _tap_blocks(grid_shape, coords, H, W, nby, nbx):
    """Taps for edge-padded coords in blocked [nb, 4, P] layout + meta."""
    from ..models.env_map import _taps
    Hp, Wp = nby * BH, nbx * BW
    cp = jnp.pad(coords, ((0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
    taps = _taps(grid_shape, cp)
    if Hp != H or Wp != W:
        mask = jnp.zeros((Hp, Wp), bool).at[:H, :W].set(True)
        taps = [(xi, yi, jnp.where(mask, w, 0.0)) for xi, yi, w in taps]
    xi4 = jnp.stack([t[0] for t in taps])
    yi4 = jnp.stack([t[1] for t in taps])
    w4 = jnp.stack([t[2].astype(jnp.float32) for t in taps])
    y0, x0, ok_b = _block_meta(yi4, xi4, grid_shape[1], grid_shape[2],
                               nby, nbx)
    # up to MAXBAD uncoverable blocks (pole / optical-axis singularities,
    # extreme zoom) are patched by direct residual gathers/scatters; only
    # beyond that does the WHOLE frame drop to the generic path
    ok = jnp.sum(~ok_b) <= MAXBAD
    return (_blocked(xi4, nby, nbx), _blocked(yi4, nby, nbx),
            _blocked(w4, nby, nbx), y0, x0, ok_b, ok)


def sample_image_pallas(grid, xi_b, yi_b, w_b, y0, x0,
                        nby: int, nbx: int,
                        as_blocks: bool = False) -> jnp.ndarray:
    """[C, Hg, Wg] x blocked taps -> [C, nby*BH, nbx*BW]
    (or the raw [nb, C, P] blocks with as_blocks=True)."""
    C = grid.shape[0]
    nb = nby * nbx
    tap_spec = pl.BlockSpec((1, 4, P), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, nb=nb, Wg=grid.shape[2]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[tap_spec, tap_spec, tap_spec,
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, C, P), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, C, WH, WW), jnp.float32),
                pltpu.SemaphoreType.DMA((2, _NCOL)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, C, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(y0, x0, xi_b, yi_b, w_b, grid)
    if as_blocks:
        return out
    # [nb, C, P] -> [C, H, W]
    return (out.reshape(nby, nbx, C, BH, BW)
            .transpose(2, 0, 3, 1, 4).reshape(C, nby * BH, nbx * BW))


def scatter_image_pallas(g_b, grid_shape, xi_b, yi_b, w_b, y0, x0,
                         nby: int, nbx: int,
                         accum_runs: bool = True) -> jnp.ndarray:
    """[nb, C, P] blocked cotangent -> [C, Hg, Wg] grid gradient."""
    C, Hg, Wg = grid_shape
    nb = nby * nbx
    tap_spec = pl.BlockSpec((1, 4, P), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, nb=nb, Wg=Wg,
                          accum_runs=accum_runs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[tap_spec, tap_spec, tap_spec,
                      pl.BlockSpec((1, C, P), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((C, WH, WW), jnp.float32),
                pltpu.SemaphoreType.DMA((_NCOL,)),
                pltpu.SemaphoreType.DMA((_NCOL,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((C, Hg, Wg), jnp.float32),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=_interpret(),
    )(y0, x0, xi_b, yi_b, w_b, g_b, jnp.zeros((C, Hg, Wg), jnp.float32))


@jax.custom_vjp
def grid_sample_image(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [C, Hg, Wg] at IMAGE-SHAPED [H, W, 2] coords in
    [-1, 1] (torch grid_sample align_corners=True, zeros padding — the
    env-map contract, scene/env.py:67-76). Blocked Pallas fast path with
    a runtime lax.cond fallback to the generic gather/scatter for frames
    whose block footprints exceed the static window. Coords get a zero
    cotangent (callers feed constant camera rays — see
    env_map._grid_sample_align_corners)."""
    out, _ = _gsi_fwd(grid, coords)
    return out


def _gsi_fwd(grid, coords):
    from ..models.env_map import _grid_sample_align_corners
    H, W = coords.shape[:2]
    if grid.shape[1] < WH or grid.shape[2] < WW:
        # grid smaller than one window (tiny test maps): generic path
        return _grid_sample_align_corners(grid, coords), (grid.shape,
                                                          coords)
    nby, nbx = -(-H // BH), -(-W // BW)
    xi_b, yi_b, w_b, y0, x0, ok_b, ok = _tap_blocks(grid.shape, coords,
                                                    H, W, nby, nbx)

    def fast(g):
        out_b = sample_image_pallas(g, xi_b, yi_b, w_b, y0, x0, nby, nbx,
                                    as_blocks=True)          # [nb, C, P]
        bad_idx, valid = _bad_blocks(ok_b)
        res = _residual_fwd(g, xi_b, yi_b, w_b, bad_idx, valid)
        out_b = out_b.at[bad_idx].set(res, mode="drop")
        C = g.shape[0]
        out = (out_b.reshape(nby, nbx, C, BH, BW)
               .transpose(2, 0, 3, 1, 4).reshape(C, nby * BH, nbx * BW))
        return out[:, :H, :W]

    def slow(g):
        return _grid_sample_align_corners(g, coords)

    out = jax.lax.cond(ok, fast, slow, grid)
    return out, (grid.shape, coords)


def _gsi_bwd(res, g):
    from ..models.env_map import _taps
    grid_shape, coords = res
    C, Hg, Wg = grid_shape
    H, W = coords.shape[:2]
    small_grid = Hg < WH or Wg < WW
    nby, nbx = -(-H // BH), -(-W // BW)
    if not small_grid:
        xi_b, yi_b, w_b, y0, x0, ok_b, ok = _tap_blocks(grid_shape, coords,
                                                        H, W, nby, nbx)

    def fast(gg):
        gp = jnp.pad(gg, ((0, 0), (0, nby * BH - H), (0, nbx * BW - W)))
        g_b = _blocked(gp, nby, nbx)
        # residual blocks: zero their cotangent into the kernel (its
        # windows cannot represent them) and scatter-add directly instead
        bad_idx, valid = _bad_blocks(ok_b)
        g_kern = g_b * ok_b[:, None, None].astype(g_b.dtype)
        d1 = scatter_image_pallas(g_kern, grid_shape, xi_b, yi_b, w_b,
                                  y0, x0, nby, nbx,
                                  accum_runs=bool(ACCUM_RUNS))
        d2 = _residual_bwd(g_b, grid_shape, xi_b, yi_b, w_b, bad_idx,
                           valid)
        return d1 + d2

    def slow(gg):
        # generic flat per-channel scatter (see env_map._grid_sample_bwd)
        flat_taps = _taps(grid_shape, coords.reshape(-1, 2))
        ids4 = jnp.concatenate([yi * Wg + xi for xi, yi, _ in flat_taps])
        gf = gg.reshape(C, -1)
        chans = []
        for c in range(C):
            vals4 = jnp.concatenate([gf[c] * w for _, _, w in flat_taps])
            chans.append(
                jnp.zeros((Hg * Wg,), gg.dtype).at[ids4].add(vals4))
        return jnp.stack(chans).reshape(C, Hg, Wg)

    if small_grid:
        d_grid = slow(g)
    else:
        d_grid = jax.lax.cond(ok, fast, slow, g)
    return d_grid, jnp.zeros_like(coords)


grid_sample_image.defvjp(_gsi_fwd, _gsi_bwd)
