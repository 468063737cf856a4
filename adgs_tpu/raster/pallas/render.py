"""Pallas compositing kernels (forward + hand-derived backward).

Replaces the scan-over-all-tiles XLA path (raster/tiled.py) with one grid
program per 16x16 tile that loops over exactly ITS depth-sorted instance
range (scalar-prefetched [start, count]), DMA-ing fixed-size instance blocks
from HBM — the TPU analog of renderCUDA's shared-memory staging
(forward.cu:302-332). Early termination when every pixel in the tile is
saturated mirrors the block-wide vote (forward.cu:308-310).

Layout (round-2 design): every hand-DMA'd HBM array is COMPONENT-MAJOR
[F, R] — geometry/feature components on sublanes, instances on lanes — so
the CHUNK-aligned dynamic slices cut the LANE axis in 128-aligned blocks
(Mosaic requires lane-dim slice alignment to the (8,128) tiling; a
row-major [R, 16] array cannot be hand-DMA'd in chunks at all).
  - instance blocks: [F, CHUNK] — rows are raw geometry
    (mx, my, ca, cb, cc, log-opacity) + features, CHUNK instances on lanes;
  - the per-pixel Gaussian exponent is evaluated as ONE MXU matmul: power
    is quadratic in the tile-local pixel (u, v), so
    power[j, pix] = coef_j . [u^2, uv, v^2, u, v, 1] with per-instance
    coefficient ROWS [8, CHUNK] built in-kernel from tile-RELATIVE means
    (tile-local coordinates keep the quadratic terms O(3-sigma) —
    evaluating the polynomial in global pixel coordinates would cancel
    catastrophically in f32);
  - alpha/weights: [CHUNK, P] — instances on sublanes, P=256 tile pixels
    on lanes; front-to-back transmittance is a sublane-axis prefix PRODUCT
    (log-step rolls), carried linearly like forward.cu's running T;
  - per-pixel accumulators: [CHo, P] via dot(feats [CHo,CHUNK],
    w [CHUNK,P], contract instances) on the MXU.

The backward runs the SAME front-to-back replay (no back-to-front pass,
no atomics): with b_j = w_j * (f_j . g) and A = sum_k b_k,
  dL/dalpha_j = T_j (f_j . g) - (A - prefixincl_j(b)) / (1 - alpha_j)
               + g_T * T_final / (1 - alpha_j)
(equivalent math to backward.cu:417-646 including the accumulated-opacity
path :612 and the background term via the final-T cotangent :620-623).
All six geometry gradients then come from ONE moment matmul
  M^T = dot(basis [8, P], d_power^T [P, CHUNK])
chained through the coefficient jacobian with a few [1, CHUNK] row ops.

Per-instance gradient columns are DMA'd to disjoint [Gc, CHUNK] slices
(tiles own disjoint instance ranges — deterministic, race-free by
construction), permuted back to the PRESORT (gaussian-major) order carried
through the sort as a payload (binning.slot_sorted) — where every
Gaussian's instances are CONTIGUOUS, with boundaries given by the
expansion prefix sums — and reduced per Gaussian by a membership-one-hot
MXU matmul kernel. No argsort, no scatter-add (TPU scatter-add runs
~500 MB/s), and ONE row-permutation gather instead of ten.
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

import os as _os

# instances per DMA block (env override for perf sweeps; capacity is
# 4096-quantized so any power of two <= 4096 divides it). 128 since
# round 5: ABAB on chip (exp/lab_chunk.py) reads 14.07/14.08 it/s at 128
# vs 13.94/13.91 at 256 — the shorter [CHUNK, P] roll chains beat the
# halved chunk count now that per-chunk overhead is amortized elsewhere
# (round-2 measured them dead even; the kernels changed). 64 does not
# lower: Mosaic rejects sub-128-lane HBM slices.
CHUNK = int(_os.environ.get("ADGS_PALLAS_CHUNK", 128))
# tiles per Pallas program (fwd + bwd). Each grid step costs ~3.3 us of
# pipeline bubble (Mosaic prologue, scalar fetches, output-block DMA sync)
# against a mean occupancy of only ~2 instance chunks per tile at KITTI
# scale (~2900 tiles x 2 kernels ~= 19 ms/step, PERF.md round-4 profile);
# batching KTILE tile ranges into one program with an in-kernel loop
# amortizes that bubble KTILE-x. The tile grid is padded to a KTILE
# multiple with empty (count 0) tiles.
KTILE = int(_os.environ.get("ADGS_KTILE", 1))
# matmul precision for FLOAT-VALUE dots (powers, feature accum, gradient
# moments, segment reduce): "high" = bf16x3 (~2^-21 relative error, half
# the MXU passes of "highest"). Integer-exact tables (binning cumsum,
# expansion) stay HIGHEST regardless — see CLAUDE.md invariant.
# NOTE: Mosaic REJECTS Precision.HIGH in compiled Pallas kernels ("high"
# works only in interpret mode / the XLA tiers); the compiled-path lever
# is the manual bf16 hi+lo split (exp/lab_prec.py finding).
MM_PREC = {"high": jax.lax.Precision.HIGH,
           "highest": jax.lax.Precision.HIGHEST}[
    _os.environ.get("ADGS_MM_PREC", "highest")]
P = TILE_PIX         # 256 pixels per tile


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests); compiled on real hardware."""
    return jax.default_backend() != "tpu"


T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
LOG_ALPHA_MAX = float(np.log(ALPHA_MAX))
OP_FLOOR = 1e-37     # log(max(op, OP_FLOOR)) keeps dead slots finite

# geometry columns in the instance buffer
_G_MX, _G_MY, _G_CA, _G_CB, _G_CC, _G_LO = 0, 1, 2, 3, 4, 5
F_GEOM = 8  # padded to a sublane tile
N_COEF = 8  # [u^2, uv, v^2, u, v, 1, 1(logop), 0]


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def pack_gaussian_rows(mean2d, conic, log_opacity, features):
    """[N, F] per-Gaussian row matrix (differentiable concat; F = 8
    geometry columns + features padded to a multiple of 8).

    Measured (exp/lab_build.py): a many-piece concat into >=128-lane rows
    costs ~10ms at N=1M (per-piece lane-offset passes), while this narrow
    form is free — so the build stays narrow even though a 128-wide row
    would put the gather on the DMA fast path; the wide trick only pays on
    the gradient side, where the pad is a single-piece concat."""
    n = mean2d.shape[0]
    ch = features.shape[-1]
    F = F_GEOM + _round8(ch)
    cols = [mean2d, conic, log_opacity[:, None],
            jnp.zeros((n, 2), jnp.float32), features]
    extra = F - F_GEOM - ch
    if extra:
        cols.append(jnp.zeros((n, extra), jnp.float32))
    return jnp.concatenate(cols, axis=-1), F


def build_instances(gauss_id, packed, F: int):
    """[F, R + CHUNK] component-major instance columns in SORTED order —
    ONE row gather + one transpose (fused into the gather's output pass),
    no scatters. The kernels read this array directly with CHUNK-rounded
    window-covering DMAs and gate out-of-range columns by their global
    index (head columns belong to the previous tile, tail columns to the
    next), so no aligned re-layout is needed.

    The trailing CHUNK pad columns duplicate Gaussian 0 (harmless — gated)
    and keep the last window-covering DMA in bounds."""
    R = gauss_id.shape[0]
    assert R % CHUNK == 0, f"instance capacity must be a multiple of {CHUNK}"
    gid_ext = jnp.concatenate(
        [gauss_id, jnp.zeros((CHUNK,), jnp.int32)])
    # barriers keep the gather on its fast standalone path (fused into
    # elementwise fusions it scalarizes; see binning.py)
    gid_ext = jax.lax.optimization_barrier(gid_ext)
    rows = jax.lax.optimization_barrier(packed[gid_ext])   # [R_pad, F]
    return rows.T


def _tile_uv(i, grid_x: int):
    """[1, P] tile-local pixel coordinates and the tile origin scalars."""
    ox = (i % grid_x) * TILE_X
    oy = (i // grid_x) * TILE_Y
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    u = (pix % TILE_X).astype(jnp.float32)
    v = (pix // TILE_X).astype(jnp.float32)
    return u, v, ox.astype(jnp.float32), oy.astype(jnp.float32)


def _basis(u, v):
    """[8, P] quadratic pixel basis (+ the logop row, + a zero pad row)."""
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    return jnp.concatenate(
        [u * u, u * v, v * v, u, v, one, one, zero], axis=0)


def _coefs(geom, ox, oy):
    """[8, CHUNK] tile-local polynomial coefficient rows from raw
    component-major geometry [F, CHUNK].

    power(u,v) = c0 u^2 + c1 uv + c2 v^2 + c3 u + c4 v + c5, with the means
    re-centered on THIS tile's origin so every term stays O((3 sigma)^2 /
    sigma^2) — f32-safe. Row 6 of the powerop coefficients carries the
    log opacity (yielding powerop); a second matmul against the same basis
    with a zero row 6 yields the raw power for the numerical-noise gate.
    (Deriving power as powerop - lo was tried and is SLOWER: the [1,CHUNK]
    -> [CHUNK,1] relayout per chunk costs more than the extra matmul,
    which pipelines on the already-loaded basis operand.)"""
    mx = geom[_G_MX:_G_MX + 1, :] - ox
    my = geom[_G_MY:_G_MY + 1, :] - oy
    ca = geom[_G_CA:_G_CA + 1, :]
    cb = geom[_G_CB:_G_CB + 1, :]
    cc = geom[_G_CC:_G_CC + 1, :]
    lo = geom[_G_LO:_G_LO + 1, :]
    c3 = ca * mx + cb * my
    c4 = cc * my + cb * mx
    c5 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my
    zero = jnp.zeros_like(lo)
    base = [-0.5 * ca, -cb, -0.5 * cc, c3, c4, c5]
    coef_op = jnp.concatenate(base + [lo, zero], axis=0)
    coef_p = jnp.concatenate(base + [zero, zero], axis=0)
    return coef_op, coef_p, (mx, my, ca, cb, cc)


def _powers(coef_op, coef_p, basis):
    """(powerop, power) [CHUNK, P] via ONE merged MXU matmul.

    The two coefficient sets share the basis operand; batching them as one
    [8, 2*CHUNK] x [8, P] dot halves MXU op issues per chunk. Each output
    element is the same independent 8-term dot product, so the results are
    BITWISE identical to two separate matmuls.

    The basis rows are small integers (u, v < 16; u*v, u^2 < 256) —
    EXACTLY bf16 — so with LIMB the coefficient operand limb-splits into
    one 3x-wide DEFAULT-precision dot (3 MXU passes vs HIGHEST's 6)."""
    n = coef_op.shape[1]
    coefs = jnp.concatenate([coef_op, coef_p], axis=1)     # [8, 2n]
    if LIMB:
        both = jax.lax.dot_general(
            _limb3(coefs, 1), basis,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [6n, P]
        both = _limb_sum(both, 0, 2 * n)
    else:
        both = jax.lax.dot_general(
            coefs, basis,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=MM_PREC)                             # [2n, P]
    return both[:n], both[n:]


def _alpha_from_powers(powerop, power, valid_rows):
    """Gated alpha [CHUNK, P] (forward.cu:344-357 semantics)."""
    alpha = jnp.minimum(ALPHA_MAX, jnp.exp(powerop))
    gate = (power > 0.0) | (alpha < ALPHA_MIN) | jnp.logical_not(valid_rows)
    return jnp.where(gate, 0.0, alpha)


# group size for the two-level sublane scans (0 = flat log-step scan,
# the measured default). The grouped scheme does fewer nominal passes
# (~14 vs ~24 at S=16, CHUNK=256) but LOSES on chip: 12.04 vs 12.43 it/s
# end-to-end (S=8: 11.74) — the [G, S, P] reshape, the strided tail
# extract and the [G, 1, P] broadcast each cost Mosaic relayout passes
# that eat the savings (exp/lab_prefix.py, ABAB same-session).
PREFIX_S = int(_os.environ.get("ADGS_PREFIX_S", 0))

# sublane-prefix strategy: "mxu" evaluates the scans as ONE triangular
# matmul on the MXU (cumprod via log space, matching the XLA reference
# tier composite.py:81); "roll" is the log-step masked-roll chain.
# MEASURED (exp/lab_scan.py, ABAB same-session): "mxu" LOSES, 11.0 vs
# 12.4 it/s end-to-end — the triangular matmul spends n/2 useless MACs
# per output (~50M MACs/chunk even with the 3-limb single-pass trick),
# ~3.6 ms net per converted scan at bench scale, more than the ~24-pass
# roll chain it replaces. Numerics of the limb-split route are fine
# (|dgrad|rel 7e-5), so the path is kept as a measured dead end and for
# interpret-mode cross-checking. Default: roll.
SCAN = _os.environ.get("ADGS_SCAN", "roll")


def _tri_strict(n: int) -> jnp.ndarray:
    """[n, n] strictly-lower-triangular ones (i > j): EXCLUSIVE prefix."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (i > j).astype(jnp.float32)


def _tri_incl(n: int) -> jnp.ndarray:
    """[n, n] lower-triangular ones incl. the diagonal: INCLUSIVE prefix."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (i >= j).astype(jnp.float32)


def _limb3(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Concat of three exactly-bf16 limbs of x (hi + mid + lo == x to
    ~2^-25 relative; EXACT for integers < 2^24 — the limbs are disjoint
    8-bit mantissa windows). A dot against an exactly-bf16 other operand
    at DEFAULT precision then reproduces the f32 product in 3 single
    passes where HIGHEST costs 6."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    lo = rem - mid
    return jnp.concatenate([hi, mid, lo], axis=axis)


def _limb_sum(y: jnp.ndarray, axis: int, n: int) -> jnp.ndarray:
    """Fold the 3 limb slices of a dot output back together."""
    sl = [slice(None)] * y.ndim

    def take(i):
        sl[axis] = slice(i * n, (i + 1) * n)
        return y[tuple(sl)]

    return take(0) + take(1) + take(2)


# Row-major instance pipeline: instance rows live as [R, 128] ROW-major
# (instances on sublanes, the 16 real feature columns lane-padded to 128)
# instead of component-major [F, R]. Rationale (PERF.md gather-wall data):
# a [R, 128] row gather rides the ~240 GB/s DMA fast path while the narrow
# [R, 16] fused-transpose form crawls at the ~150M rows/s row-issue wall —
# and the SAME trick applies to the backward's grad permute, whose rows the
# bwd kernel then emits row-major directly. The kernels transpose each
# [CHUNK, 128] block once in VMEM (one Mosaic transpose per chunk) so all
# compositing math keeps the measured [*, CHUNK]/[CHUNK, P] layouts.
RM = int(_os.environ.get("ADGS_RM", "0"))
# Hybrid default (exp/lab_rm.py, exp/lab_prscatter.py): full-RM instances
# LOSE end-to-end (+3.8ms/step: the kernels' 8x wider DMA reads outweigh
# the permute win), but emitting only the BACKWARD grad rows row-major
# wins on the permute side; RM_GRAD/PR_SCATTER control that hybrid.
RM_GRAD = int(_os.environ.get("ADGS_RM_GRAD", "0"))
PR_SCATTER = int(_os.environ.get("ADGS_PR_SCATTER", "0"))
# cross-program prefetch of the next tile's first instance chunk
XPF = int(_os.environ.get("ADGS_XPF", "1"))
LANES = 128


_PAD_BLK = 1024


def _pad_lanes_kernel(src_ref, out_ref, *, F: int):
    out_ref[...] = jnp.concatenate(
        [src_ref[...].T, jnp.zeros((src_ref.shape[1], LANES - F),
                                   jnp.float32)], axis=1)


def pad_to_lanes(packed_t: jnp.ndarray) -> jnp.ndarray:
    """[F, N] component-major -> [N_pad, LANES] row-major lane pad as a
    transposing Pallas kernel (rows padded up to _PAD_BLK; callers' gather
    indices stay < N).

    Why a kernel, and why the TRANSPOSED input: (a) it is the cheapest
    form — one 64 MB read + 512 MB write ≈ 0.75 ms (an XLA multi-piece
    concat costs ~10 ms of per-piece lane-offset passes, exp/lab_build.py);
    (b) Pallas REQUIRES default layouts on its operands, which firewalls
    XLA's layout assignment — but a default-{1,0} demand on an [N, 16]
    operand means 16 lanes padded to 128, and XLA propagates that demand
    up through the pack concat into the preprocess math, materializing
    every [1M, 3] jvp temp at 42.7x padding (488 MB each — compile OOM;
    exp/lab_rm.log). The [F, N] form's default layout puts N on the lanes
    (zero padding), which is exactly the layout the preprocess naturally
    produces for its [N, small] arrays ({0,1} bitcasts), so the demand is
    a no-op; the kernel transposes each block once in VMEM."""
    F, n = packed_t.shape
    n_pad = -(-n // _PAD_BLK) * _PAD_BLK
    if n_pad != n:
        packed_t = jnp.pad(packed_t, ((0, 0), (0, n_pad - n)))
    return pl.pallas_call(
        functools.partial(_pad_lanes_kernel, F=F),
        grid=(n_pad // _PAD_BLK,),
        in_specs=[pl.BlockSpec((F, _PAD_BLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((_PAD_BLK, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32),
        interpret=_interpret(),
    )(packed_t)


def build_instances_rm(gauss_id, packed, F: int):
    """[R + CHUNK, LANES] ROW-major sorted instance rows: lane-pad (MXU)
    + one wide row gather on the 128-lane DMA fast path. The trailing
    CHUNK pad rows duplicate Gaussian 0 (harmless — gated) and keep the
    last window-covering DMA in bounds."""
    R = gauss_id.shape[0]
    assert R % CHUNK == 0, f"instance capacity must be a multiple of {CHUNK}"
    gid_ext = jnp.concatenate([gauss_id, jnp.zeros((CHUNK,), jnp.int32)])
    wide = pad_to_lanes(packed.T)   # .T is a {0,1}<->{1,0} layout bitcast
    gid_ext = jax.lax.optimization_barrier(gid_ext)
    wide = jax.lax.optimization_barrier(wide)
    return jax.lax.optimization_barrier(wide[gid_ext])      # [R_pad, LANES]


# limb-split cheap precision for kernel dots with one EXACTLY-bf16 operand
# (the integer pixel basis, the 0/1 one-hot membership, the 0/1 prefix
# triangle): 3 single-pass DEFAULT matmuls instead of HIGHEST's 6 passes,
# at equal-or-better accuracy. MEASURED (exp/lab_limb.py, ABAB): 13.53 vs
# 12.70 it/s (+6.6%) with BITWISE-identical loss and gradients.
LIMB = int(_os.environ.get("ADGS_LIMB", "1"))

# manual bf16x3 for the float-x-float kernel dots (fg, feature accum,
# d_feat): hi/lo split of BOTH operands, lo-x-lo dropped — the same
# 3-pass scheme as XLA's Precision.HIGH (~2^-21 relative), which Mosaic
# rejects inside compiled kernels; HIGHEST costs 6 passes. Env-gated for
# A/B (exp/lab_limb.py float3 arms).
FLOAT3 = int(_os.environ.get("ADGS_FLOAT3", "0"))


def _dot_f3(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """bf16x3 dot_general: a_hi.b_hi + a_hi.b_lo + a_lo.b_hi, each a
    single DEFAULT-precision pass (operands exactly bf16). The two
    a_hi products share their operand and batch into one double-width
    dot along b's free axis (2 MXU issues total)."""
    if not FLOAT3:
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=MM_PREC)
    ((ac,), (bc,)), _ = dims
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    # b's free axis (it has exactly one: these are 2-D dots)
    bf = 1 - bc
    p = b.shape[bf]
    bb = jnp.concatenate([b_hi, b_lo], axis=bf)
    hi_both = jax.lax.dot_general(a_hi, bb, dimension_numbers=dims,
                                  preferred_element_type=jnp.float32)
    lo_hi = jax.lax.dot_general(a_lo, b_hi, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
    # output layout: (a free axis, b free axis) — b's free axis is last
    return hi_both[:, :p] + hi_both[:, p:] + lo_hi


def _mxu_prefix(tri: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """prefix[i, p] = sum_{j in tri row i} x[j, p] as ONE wide MXU matmul.

    x is split into three exactly-bf16 limbs batched along the lane axis
    (one [n, n] x [n, 3P] dot — same merged-operand trick as _powers);
    tri is 0/1 (exact in bf16), so DEFAULT precision loses nothing."""
    n, p = x.shape
    out = jax.lax.dot_general(
        tri, _limb3(x, 1), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [n, 3P]
    return _limb_sum(out, 1, p)


def _scan_sub(x: jnp.ndarray, combine, identity: float) -> jnp.ndarray:
    """Inclusive scan along the FIRST (sublane/instance) axis — Mosaic has
    no native scan. Two-level masked-roll scheme (flat when PREFIX_S=0)."""
    n, p = x.shape
    S = PREFIX_S
    if S <= 0 or S >= n or n % S:
        sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        k = 1
        while k < n:
            shifted = pltpu.roll(x, shift=k, axis=0)
            x = combine(x, jnp.where(sub >= k, shifted, identity))
            k *= 2
        return x
    G = n // S
    # group-local Hillis-Steele: the (sub mod S) >= k mask stops carries at
    # group boundaries, so each S-row group scans independently
    subm = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % S
    y = x
    k = 1
    while k < S:
        shifted = pltpu.roll(y, shift=k, axis=0)
        y = combine(y, jnp.where(subm >= k, shifted, identity))
        k *= 2
    y3 = y.reshape(G, S, p)
    tails = y3[:, S - 1, :]                      # [G, P] group totals
    subg = jax.lax.broadcasted_iota(jnp.int32, tails.shape, 0)
    t = tails
    k = 1
    while k < G:
        shifted = pltpu.roll(t, shift=k, axis=0)
        t = combine(t, jnp.where(subg >= k, shifted, identity))
        k *= 2
    # exclusive inter-group carry, broadcast back over each group's rows
    excl = jnp.where(subg == 0, identity, pltpu.roll(t, shift=1, axis=0))
    return combine(y3, excl[:, None, :]).reshape(n, p)


def _sub_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    return _scan_sub(x, jnp.add, 0.0)


def _sub_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    return _scan_sub(x, jnp.multiply, 1.0)


def _chunk_weights(alpha, t_raw, t_eff):
    """Replicates composite.blend_weights for one block, MULTIPLICATIVELY
    (forward.cu carries T as a plain f32 product, :336,361 — the log-space
    form costs a log1p + an exp per instance-pixel, the two hottest VPU ops
    in both kernels; the product form matches the reference's own numerics).

    alpha: [CHUNK, P] front-to-back along sublanes; carries t_raw / t_eff:
    [1, P] linear transmittances entering this block. Returns
    (w, new_raw, new_eff, (a_eff, t_excl, include)) with include = raw
    running product >= 1e-4.

    include is a PREFIX property per pixel (the raw product only decreases),
    so the effective product equals the raw one until the termination
    instance and FREEZES there — one min-reduce over the included raw
    values replaces a second prefix pass. Underflow past ~1e-38 flushes the
    raw product to zero, which is exact here: by then every gate compare
    (>= 1e-4) and every weight it could feed is already zero."""
    one_m = 1.0 - alpha
    if SCAN == "mxu":
        # cumprod as an EXCLUSIVE log-space MXU prefix (strict triangle),
        # then one multiply recovers the inclusive product — same math as
        # the XLA reference tier (composite.py:81), fed by log1p for
        # small-alpha accuracy. exp(s) <= 1 for s <= 0 in round-to-nearest
        # and one_m <= 1, so the cum_raw <= t_raw invariant below holds.
        excl = _mxu_prefix(_tri_strict(alpha.shape[0]), jnp.log1p(-alpha))
        t_excl = jnp.exp(excl) * t_raw
        cum_raw = t_excl * one_m
    else:
        cum_raw = _sub_cumprod(one_m) * t_raw
        # exclusive product = inclusive shifted down one, t_raw first
        sub0 = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 0) == 0
        t_excl = jnp.where(sub0, t_raw, pltpu.roll(cum_raw, shift=1, axis=0))
    # cum_raw <= t_raw holds EXACTLY in f32 (every factor is <= 1, and
    # x*y with y <= 1 rounds to <= x), so pixels terminated in an earlier
    # chunk (t_raw < eps) are already excluded — no second compare needed
    include = cum_raw >= T_EPS
    a_eff = jnp.where(include, alpha, 0.0)
    w = a_eff * t_excl
    new_eff = jnp.minimum(
        jnp.min(jnp.where(include, cum_raw, jnp.inf), axis=0, keepdims=True),
        t_eff)
    return w, cum_raw[-1:, :], new_eff, (a_eff, t_excl, include)


def _inst_dma(inst_hbm, buf, sem, start_al, rm: bool):
    """Chunk DMA factory for both instance layouts: row-major [R_pad, 128]
    slices sublanes (rows), component-major [F, R_pad] slices lanes."""
    if rm:
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                inst_hbm.at[pl.ds(start_al + c * CHUNK, CHUNK), :],
                buf.at[slot], sem.at[slot])
    else:
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                inst_hbm.at[:, pl.ds(start_al + c * CHUNK, CHUNK)],
                buf.at[slot], sem.at[slot])
    return get_dma


def _nchunks_of(tile_start, tile_count, j):
    start = tile_start[j]
    cnt = tile_count[j]
    start_al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    return start_al, jnp.where(cnt > 0,
                               pl.cdiv(start + cnt - start_al, CHUNK), 0)


def _prefetch_next_tile(tile_start, tile_count, inst_hbm, buf, sem, i,
                        n_tiles: int, rm: bool):
    """Start the NEXT tile's first instance DMA into slot 0 before this
    program returns (the grid is sequential, all of this program's
    instance DMAs are drained by now): removes the cold-start DMA
    latency bubble every program otherwise pays at its first wait —
    ~2000 programs per kernel at KITTI scale."""
    @pl.when(i + 1 < n_tiles)
    def _():
        start_al_n, nch_n = _nchunks_of(tile_start, tile_count, i + 1)

        @pl.when(nch_n > 0)
        def _():
            _inst_dma(inst_hbm, buf, sem, start_al_n, rm)(0, 0).start()


def _fwd_kernel(tile_start, tile_count, inst_hbm, out_ref,
                buf, sem, *, grid_x: int, ch: int, f_cols: int, rm: bool,
                n_tiles: int, ktile: int):
    p0 = pl.program_id(0) * ktile
    # the pixel basis is TILE-LOCAL — identical for every tile; only the
    # origin scalars (ox, oy) vary inside the tile loop
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    u = (pix % TILE_X).astype(jnp.float32)
    v = (pix // TILE_X).astype(jnp.float32)
    basis = _basis(u, v)
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def tile_body(t, carry):
        i = p0 + t
        start = tile_start[i]
        cnt = tile_count[i]
        # window-covering DMA: round the start down to the chunk tile
        # (Mosaic needs provably aligned dynamic lane starts); head columns
        # belong to the previous tile and are gated out by their global
        # index below
        start_al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
        ox = ((i % grid_x) * TILE_X).astype(jnp.float32)
        oy = ((i // grid_x) * TILE_Y).astype(jnp.float32)

        nchunks = jnp.where(cnt > 0,
                            pl.cdiv(start + cnt - start_al, CHUNK), 0)

        get_dma = _inst_dma(inst_hbm, buf, sem, start_al, rm)

        # chunk 0 was prefetched at the END of the previous tile (previous
        # loop iteration, or the previous program's last tile — the grid is
        # sequential); only the very first tile starts its own
        @pl.when((nchunks > 0) & (i == 0) if XPF else (nchunks > 0))
        def _():
            get_dma(0, 0).start()

        def cond(state):
            c, t_raw, _, _ = state
            return (c < nchunks) & (jnp.max(t_raw) >= T_EPS)

        def body(state):
            c, t_raw, t_eff, accum = state

            @pl.when(c + 1 < nchunks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(c % 2, c).wait()
            # row-major blocks transpose ONCE in VMEM so every downstream
            # op keeps the measured [*, CHUNK] lane-major layouts
            geom = buf[c % 2].T if rm else buf[c % 2]      # [F|LANES, CHUNK]
            pos = sub + (start_al + c * CHUNK)             # [CHUNK, 1]
            valid = (pos >= start) & (pos < start + cnt)
            coef_op, coef_p, _ = _coefs(geom, ox, oy)
            powerop, power = _powers(coef_op, coef_p, basis)  # [CHUNK, P] x2
            alpha = _alpha_from_powers(powerop, power, valid)
            w, t_raw, t_eff, _ = _chunk_weights(alpha, t_raw, t_eff)
            feats = geom[F_GEOM:F_GEOM + ch, :]            # [CHo, CHUNK]
            accum = accum + _dot_f3(
                feats, w, (((1,), (0,)), ((), ())))        # [CHo, P]
            return c + 1, t_raw, t_eff, accum

        init = (jnp.int32(0),
                jnp.ones((1, P), jnp.float32),
                jnp.ones((1, P), jnp.float32),
                jnp.zeros((ch, P), jnp.float32))
        c_end, _, t_eff, accum = jax.lax.while_loop(cond, body, init)

        # early exit leaves one prefetched DMA in flight; drain it so the
        # scratch semaphore is clean for the next tile
        @pl.when(c_end < nchunks)
        def _():
            get_dma(c_end % 2, c_end).wait()

        if XPF:
            _prefetch_next_tile(tile_start, tile_count, inst_hbm, buf, sem,
                                i, n_tiles, rm)
        out_ref[t, :ch, :] = accum
        out_ref[t, ch:ch + 1, :] = t_eff
        return carry

    if ktile == 1:
        tile_body(0, 0)
    else:
        jax.lax.fori_loop(0, ktile, tile_body, 0)


def _bwd_kernel(tile_start, tile_count, inst_hbm, zgrad_in, g_ref, blend_ref,
                grad_hbm, buf, gbuf, rbuf, sem, wsem, rsem, *,
                grid_x: int, ch: int, f_cols: int, g_cols: int, rm: bool,
                rm_out: bool, n_tiles: int, ktile: int):
    del zgrad_in  # aliased to grad_hbm; zeros provide the init
    p0 = pl.program_id(0) * ktile
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    u = (pix % TILE_X).astype(jnp.float32)
    v = (pix // TILE_X).astype(jnp.float32)
    basis = _basis(u, v)
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def tile_main(t, carry):
        i = p0 + t
        start = tile_start[i]
        cnt = tile_count[i]
        start_al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
        ox = ((i % grid_x) * TILE_X).astype(jnp.float32)
        oy = ((i // grid_x) * TILE_Y).astype(jnp.float32)

        g = g_ref[t]               # [CH+1, P] cotangents (features + final_t)
        blended = blend_ref[t]     # [CH+1, P] forward outputs
        t_final = blended[ch:ch + 1, :]          # [1, P]
        g_t = g[ch:ch + 1, :]                    # [1, P]
        # A = sum_k b_k  per pixel: sum over channels of blended*g
        a_dot_g = jnp.sum(blended[:ch, :] * g[:ch, :], axis=0, keepdims=True)
        gt_tfin = g_t * t_final                  # [1, P]

        nchunks = jnp.where(cnt > 0,
                            pl.cdiv(start + cnt - start_al, CHUNK), 0)

        def cond(state):
            c, t_raw, _, _ = state
            return (c < nchunks) & (jnp.max(t_raw) >= T_EPS)

        get_dma = _inst_dma(inst_hbm, buf, sem, start_al, rm)

        def grad_slice(cc):
            if rm_out:
                return grad_hbm.at[pl.ds(start_al + cc * CHUNK, CHUNK), :]
            return grad_hbm.at[:, pl.ds(start_al + cc * CHUNK, CHUNK)]

        # chunk 0 was prefetched at the END of the previous tile (previous
        # loop iteration or previous program); only the first tile starts
        # its own
        @pl.when((nchunks > 0) & (i == 0) if XPF else (nchunks > 0))
        def _():
            get_dma(0, 0).start()

        @pl.when(nchunks > 0)
        def _():
            # the first output block is SHARED with the previous tile's
            # tail (both round into the same chunk tile); tiles run
            # sequentially and each drains its writes before returning, so
            # read-add-write keeps the neighbour's columns intact —
            # race-free
            pltpu.make_async_copy(grad_slice(0), rbuf, rsem).start()

        def body(state):
            c, t_raw, t_eff, prefix = state

            @pl.when(c + 1 < nchunks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(c % 2, c).wait()
            geom = buf[c % 2].T if rm else buf[c % 2]          # [F|LANES, CHUNK]
            pos = sub + (start_al + c * CHUNK)
            valid = (pos >= start) & (pos < start + cnt)
            coef_op, coef_p, (mx, my, ca, cb, cc) = _coefs(geom, ox, oy)
            powerop, power = _powers(coef_op, coef_p, basis)    # [CHUNK, P] x2
            alpha = _alpha_from_powers(powerop, power, valid)
            w, new_raw, new_eff, (a_eff, t_excl, include) = _chunk_weights(
                alpha, t_raw, t_eff)

            feats = geom[F_GEOM:F_GEOM + ch, :]                # [CHo, CHUNK]
            # fg[j, pix] = f_j . g  -> [CHUNK, P]
            fg = _dot_f3(feats, g[:ch, :], (((0,), (0,)), ((), ())))
            b = w * fg
            if SCAN == "mxu":
                prefix_incl = _mxu_prefix(_tri_incl(b.shape[0]), b) + prefix
            else:
                prefix_incl = _sub_cumsum(b) + prefix
            inv1m = 1.0 / (1.0 - a_eff)
            # dT_final/dalpha_j = -T_final/(1-alpha_j): the kernel's T output
            # is the transmittance itself (the wrapper forms opacity = 1 - T)
            d_alpha = (t_excl * fg
                       - (a_dot_g - prefix_incl) * inv1m
                       - gt_tfin * inv1m)
            d_alpha = jnp.where(include & (alpha > 0.0), d_alpha, 0.0)
            # zero where the 0.99 clamp was active; alpha == exp(powerop) on the
            # surviving (unclamped) path, so d_powerop = d_alpha * alpha exactly
            d_powerop = jnp.where(powerop < LOG_ALPHA_MAX, d_alpha * alpha, 0.0)

            # ALL geometry gradients from one moment matmul:
            # MT[k, j] = sum_pix basis_k * d_powerop[j]  -> [8, CHUNK]
            if LIMB:
                MT = jax.lax.dot_general(
                    basis, _limb3(d_powerop, 0),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [8, 3*CHUNK]
                MT = _limb_sum(MT, 1, d_powerop.shape[0])
            else:
                MT = jax.lax.dot_general(
                    basis, d_powerop,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PREC)
            d_c0 = MT[0:1, :]
            d_c1 = MT[1:2, :]
            d_c2 = MT[2:3, :]
            d_c3 = MT[3:4, :]
            d_c4 = MT[4:5, :]
            d_c5 = MT[5:6, :]
            d_lo = MT[6:7, :]
            # chain through the tile-local coefficient jacobian ([1,CHUNK] ops)
            c3 = ca * mx + cb * my
            c4 = cc * my + cb * mx
            d_mx = ca * d_c3 + cb * d_c4 - c3 * d_c5
            d_my = cb * d_c3 + cc * d_c4 - c4 * d_c5
            d_ca = -0.5 * d_c0 + mx * d_c3 - 0.5 * mx * mx * d_c5
            d_cb = -d_c1 + my * d_c3 + mx * d_c4 - mx * my * d_c5
            d_cc = -0.5 * d_c2 + my * d_c4 - 0.5 * my * my * d_c5
            # dL/df_j = sum_pix w * g_ch  -> [CHo, CHUNK]
            d_feat = _dot_f3(g[:ch, :], w, (((1,), (1,)), ((), ())))

            grows = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_lo, d_feat], axis=0)
            if rm_out:
                # emit ROW-major [CHUNK, LANES] so the downstream permute rides
                # the 128-lane gather fast path with no boundary transpose
                growsT = grows.T                               # [CHUNK, cols]
                grows = jnp.concatenate(
                    [growsT, jnp.zeros((CHUNK, LANES - growsT.shape[1]),
                                       jnp.float32)], axis=1)
            else:
                pad_rows = g_cols - grows.shape[0]
                if pad_rows > 0:
                    grows = jnp.concatenate(
                        [grows, jnp.zeros((pad_rows, CHUNK), jnp.float32)],
                        axis=0)

            # double-buffered grad writes: drain the write issued two chunks
            # ago on this slot before overwriting it, then fire-and-forget —
            # a write wait per chunk serializes the loop on the DMA latency
            s = c % 2

            def put_dma(slot, cc):
                return pltpu.make_async_copy(
                    gbuf.at[slot], grad_slice(cc), wsem.at[slot])

            @pl.when(c >= 2)
            def _():
                put_dma(s, c - 2).wait()

            gbuf[s] = grows

            @pl.when(c == 0)
            def _():
                # fold in the shared boundary block (see the read DMA above);
                # this tile's gated-out columns carry exact zeros, so the add
                # only restores the neighbour's values
                pltpu.make_async_copy(grad_slice(0), rbuf, rsem).wait()
                gbuf[0] = gbuf[0] + rbuf[...]

            put_dma(s, c).start()
            return c + 1, new_raw, new_eff, prefix_incl[-1:, :]

        init = (jnp.int32(0),
                jnp.ones((1, P), jnp.float32),
                jnp.ones((1, P), jnp.float32),
                jnp.zeros((1, P), jnp.float32))
        c_end, _, _, _ = jax.lax.while_loop(cond, body, init)

        @pl.when(c_end < nchunks)
        def _():
            get_dma(c_end % 2, c_end).wait()

        # drain the (up to two) writes still in flight BEFORE moving on:
        # tiles run sequentially and the next tile's boundary read may
        # target this tile's last chunk
        def put_dma_end(cc):
            return pltpu.make_async_copy(
                gbuf.at[cc % 2], grad_slice(cc), wsem.at[cc % 2])

        @pl.when(c_end >= 2)
        def _():
            put_dma_end(c_end - 2).wait()

        @pl.when(c_end >= 1)
        def _():
            put_dma_end(c_end - 1).wait()

        if XPF:
            _prefetch_next_tile(tile_start, tile_count, inst_hbm, buf, sem,
                                i, n_tiles, rm)
        return carry

    if ktile == 1:
        tile_main(0, 0)
    else:
        jax.lax.fori_loop(0, ktile, tile_main, 0)


SEG_BLK = 512    # gaussians per segment-reduce program
SEG_C = 512      # gaussian-major instance rows per DMA chunk


def _segreduce_kernel(bounds, gm_hbm, start_ref, end_ref, out_ref,
                      buf, sem, *, g_cols: int, rm: bool):
    """Per-Gaussian reduction over gaussian-major CONTIGUOUS instance
    columns (component-major [Gc, R_seg]).

    Program b owns gaussians [b*SEG_BLK, (b+1)*SEG_BLK) whose instances
    occupy columns [bounds[b], bounds[b+1]) (the expansion prefix sums,
    scalar-prefetched). It walks that range in SEG_C chunks (starts rounded
    down to the chunk tile — out-of-block columns fall outside every
    [start_j, end_j) membership window and vanish) and accumulates
      out[:, j] = sum_r in [start_j, end_j) cols[:, r]
    as a membership-one-hot MXU matmul. No gid data is needed: membership
    is two iota compares against this block's per-Gaussian start/end."""
    b = pl.program_id(0)
    start = bounds[b]
    end = bounds[b + 1]
    start_al = pl.multiple_of((start // SEG_C) * SEG_C, SEG_C)
    nchunks = pl.cdiv(end - start_al, SEG_C)

    g_start = start_ref[0]       # [1, SEG_BLK] first instance col per gaussian
    g_end = end_ref[0]           # [1, SEG_BLK] one-past-last
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (SEG_C, 1), 0)

    def get_dma(slot, c):
        src = (gm_hbm.at[pl.ds(start_al + c * SEG_C, SEG_C), :] if rm
               else gm_hbm.at[:, pl.ds(start_al + c * SEG_C, SEG_C)])
        return pltpu.make_async_copy(src, buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(c, accum):
        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()
        get_dma(c % 2, c).wait()
        chunk = buf[c % 2]           # rm: [SEG_C, LANES] else [g_cols, SEG_C]
        pos = pos0 + (start_al + c * SEG_C)      # [SEG_C, 1]
        member = ((pos >= g_start) & (pos < g_end)).astype(jnp.float32)
        if rm:
            # slice to the real columns BEFORE the dot: keeps the MXU work
            # at g_cols wide instead of LANES (8x fewer MACs)
            ck = chunk[:, :g_cols]               # [SEG_C, g_cols]
            if LIMB:
                d = jax.lax.dot_general(
                    member, _limb3(ck, 1),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [SEG_BLK, 3*g]
                return accum + _limb_sum(d, 1, g_cols)
            return accum + jax.lax.dot_general(
                member, ck, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MM_PREC)               # [SEG_BLK, g_cols]
        if LIMB:
            # member is 0/1 (exact bf16): limb-split the grad rows
            d = jax.lax.dot_general(
                _limb3(chunk, 0), member,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [3*g_cols, SEG_BLK]
            return accum + _limb_sum(d, 0, g_cols)
        return accum + jax.lax.dot_general(
            chunk, member,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=MM_PREC)  # [g_cols, SEG_BLK]

    acc_shape = (SEG_BLK, g_cols) if rm else (g_cols, SEG_BLK)
    accum = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros(acc_shape, jnp.float32))
    # the OUTPUT stays component-major [g_cols, SEG_BLK] in BOTH layouts
    # (one VMEM transpose per block in rm): a Pallas output is pinned to
    # the default {1,0} layout, and [N, 16] default means 16 lanes padded
    # to 128 — that 8x-padded layout then propagates through the d_packed
    # slices into every [N, small] cotangent of the preprocess backward,
    # materializing 488 MB temps (compile OOM, exp/lab_rm.log). [g_cols, N]
    # default is padding-free and bitcast-transposes outside.
    out_ref[...] = accum.T if rm else accum


def segment_reduce_contiguous(cols: jnp.ndarray, gauss_start: jnp.ndarray,
                              num_rendered: jnp.ndarray,
                              n_gauss: int,
                              rm_cols: int | None = None) -> jnp.ndarray:
    """[Gc, R_seg] gaussian-major columns -> [n_gauss, Gc] per-Gaussian sums.

    gauss_start: [N] exclusive prefix sums (binning.gauss_start); gaussian
    i's columns are [gauss_start[i], gauss_start[i] + tiles_i), clamped to
    the instance capacity R (overflow truncation, matching the forward).

    Accepts EITHER layout: component-major [Gc, R_seg] (g_cols explicit
    via the shape) or row-major [R_seg, LANES] with `rm_cols` real columns
    (the RM pipeline) — the row-major form returns [n_gauss, rm_cols]."""
    rm = rm_cols is not None
    if rm:
        R_seg, _ = cols.shape
        g_cols = rm_cols
    else:
        g_cols, R_seg = cols.shape
    R = R_seg - SEG_C            # capacity (cols carries one pad chunk)
    n_blocks = -(-n_gauss // SEG_BLK)
    ng_pad = n_blocks * SEG_BLK

    limit = jnp.minimum(num_rendered.astype(jnp.int32), R)
    ext = jnp.concatenate(
        [jnp.minimum(gauss_start, limit),
         jnp.full((ng_pad + 1 - n_gauss,), limit, jnp.int32)])
    idx = jnp.arange(0, ng_pad + 1, SEG_BLK, dtype=jnp.int32)
    bounds = ext[idx]
    # [n_blocks, 1, SEG_BLK]: the unit middle axis makes the VMEM block
    # legal under Mosaic's trailing-dims rule (block == array trailing dims)
    starts3d = ext[:ng_pad].reshape(n_blocks, 1, SEG_BLK)
    ends3d = ext[1:ng_pad + 1].reshape(n_blocks, 1, SEG_BLK)

    buf_shape = (2, SEG_C, LANES) if rm else (2, g_cols, SEG_C)
    out_spec = pl.BlockSpec((g_cols, SEG_BLK), lambda b, *_: (0, b),
                            memory_space=pltpu.VMEM)
    out_shape = (g_cols, ng_pad)
    out = pl.pallas_call(
        functools.partial(_segreduce_kernel, g_cols=g_cols, rm=rm),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, SEG_BLK), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, SEG_BLK), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM(buf_shape, jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(bounds, cols, starts3d, ends3d)
    return out[:, :n_gauss].T


class _CompositeOut(NamedTuple):
    blended: jnp.ndarray   # [T, CH, P]
    final_t: jnp.ndarray   # [T, P]


def _tile_pad(num_tiles: int) -> int:
    """Tile count padded to a KTILE multiple (pad tiles have count 0)."""
    return -(-num_tiles // KTILE) * KTILE


def _pad_ranges(tile_start, tile_count, n_pad: int):
    pad = n_pad - tile_start.shape[0]
    if pad == 0:
        return tile_start, tile_count
    z = jnp.zeros((pad,), tile_start.dtype)
    return (jnp.concatenate([tile_start, z]),
            jnp.concatenate([tile_count, z]))


def _fwd_call(inst, F, tile_start, tile_count, num_tiles, grid_x, ch):
    rm = inst.ndim == 2 and inst.shape[1] == LANES and F <= LANES
    kernel = functools.partial(_fwd_kernel, grid_x=grid_x, ch=ch, f_cols=F,
                               rm=rm, n_tiles=num_tiles, ktile=KTILE)
    n_pad = _tile_pad(num_tiles)
    tile_start, tile_count = _pad_ranges(tile_start, tile_count, n_pad)
    buf_shape = (2, CHUNK, LANES) if rm else (2, F, CHUNK)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_pad // KTILE,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((KTILE, ch + 1, P),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(buf_shape, jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, ch + 1, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(tile_start, tile_count, inst)
    return out[:num_tiles] if n_pad != num_tiles else out


def _bwd_call(inst, F, tile_start, tile_count, g_all, blended_all,
              num_tiles, grid_x, ch, R_pad, rm_out: bool | None = None):
    g_cols = _round8(F_GEOM - 2 + ch)  # 6 geom grads + feat grads, padded
    rm = inst.ndim == 2 and inst.shape[1] == LANES and F <= LANES
    if rm_out is None:
        rm_out = rm
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, ch=ch, f_cols=F,
                               g_cols=g_cols, rm=rm, rm_out=rm_out,
                               n_tiles=num_tiles, ktile=KTILE)
    n_pad = _tile_pad(num_tiles)
    tile_start, tile_count = _pad_ranges(tile_start, tile_count, n_pad)
    if n_pad != num_tiles:
        zpad = jnp.zeros((n_pad - num_tiles,) + g_all.shape[1:],
                         jnp.float32)
        g_all = jnp.concatenate([g_all, zpad], axis=0)
        blended_all = jnp.concatenate([blended_all, zpad], axis=0)
    buf_shape = (2, CHUNK, LANES) if rm else (2, F, CHUNK)
    gbuf_shape = (2, CHUNK, LANES) if rm_out else (2, g_cols, CHUNK)
    rbuf_shape = (CHUNK, LANES) if rm_out else (g_cols, CHUNK)
    grad_shape = (R_pad, LANES) if rm_out else (g_cols, R_pad)
    grad_inst = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_pad // KTILE,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((KTILE, ch + 1, P), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KTILE, ch + 1, P), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM(buf_shape, jnp.float32),
                pltpu.VMEM(gbuf_shape, jnp.float32),
                pltpu.VMEM(rbuf_shape, jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(grad_shape, jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=_interpret(),
    )(tile_start, tile_count, inst,
      jnp.zeros(grad_shape, jnp.float32), g_all, blended_all)
    return grad_inst


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def composite_packed(packed, bin_info, ch, num_tiles, grid_x):
    """Composite from pre-packed Gaussian rows (pack_gaussian_rows).

    The custom_vjp boundary speaks ONE wide [N, 128] array in each
    direction: narrow [N, 2]/[N, 3] args and grads would each materialize
    128-lane padded HBM buffers at this boundary (64x bloat); packing and
    unpacking happen in caller-side fusions instead.

    bin_info = (gauss_id [R], slot_sorted [R], tile_start [T],
    tile_count [T], gauss_start [N], num_rendered)."""
    out, _ = _composite_fwd(packed, bin_info, ch, num_tiles, grid_x)
    return out


def _composite_fwd(packed, bin_info, ch, num_tiles, grid_x):
    (gauss_id, slot_sorted, tile_start, tile_count,
     gauss_start, num_rendered) = bin_info
    F = F_GEOM + _round8(ch)
    build = build_instances_rm if RM else build_instances
    inst = build(gauss_id, packed, F)
    out = _fwd_call(inst, F, tile_start, tile_count, num_tiles, grid_x, ch)
    result = _CompositeOut(blended=out[:, :ch, :], final_t=out[:, ch, :])
    residuals = (inst, out, slot_sorted, tile_start, tile_count,
                 gauss_start, num_rendered, packed.shape[0])
    return result, residuals


def _composite_bwd(ch, num_tiles, grid_x, residuals, g):
    (inst, out, slot_sorted, tile_start, tile_count,
     gauss_start, num_rendered, n_gauss) = residuals
    rm = inst.shape[1] == LANES
    rm_out = rm or bool(RM_GRAD)
    F = F_GEOM + _round8(ch) if rm else inst.shape[0]
    R_pad = inst.shape[0] if rm else inst.shape[1]
    R = R_pad - CHUNK  # binning capacity
    g_all = jnp.concatenate([g.blended, g.final_t[:, None, :]], axis=1)
    grad_cm = _bwd_call(inst, F, tile_start, tile_count, g_all,
                        out, num_tiles, grid_x, ch, R_pad, rm_out=rm_out)
    # rm_out: [R_pad, LANES] row-major; else [Gc, R_pad] component-major

    # permute sorted-order grad columns back to the PRESORT gaussian-major
    # order (instances contiguous per Gaussian). Two fast-path tricks
    # (PERF.md round-2 measurements, exp/lab_rowmajor.py):
    #   - a narrow [R,16] row gather whose output feeds DIRECTLY into a
    #     transpose is the fastest permute form on TPU (13.4ms at 2M rows)
    #     — faster than the standalone narrow gather (~27ms, row-rate
    #     wall) and than padding to 128 lanes and gathering wide (17.3ms);
    #   - the inverse permutation comes from a 1-key sort (3.9ms vs 13.6ms
    #     for a scatter-set): slot_sorted holds every rendered presort slot
    #     exactly once (sentinel R for padding, sorting last), so sorting
    #     it ascending with a position payload yields at position p the
    #     SORTED index of presort slot p. Never-rendered slots land on
    #     positions the kernel never wrote (zeros via the aliased init).
    R_seg = -(-R // SEG_C) * SEG_C + SEG_C

    def _inv_perm():
        _, inv = jax.lax.sort(
            (slot_sorted, jnp.arange(R, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        inv = jnp.concatenate([inv, jnp.full((R_seg - R,), R, jnp.int32)])
        return jax.lax.optimization_barrier(inv)

    if rm_out and PR_SCATTER:
        # scatter the 128-lane grad rows straight to their presort slots:
        # no sort, no gather. slot_sorted is a permutation of the rendered
        # presort slots with sentinel R for padding — every duplicate at
        # row R writes an exact-zero row (pad grads are zero-gated), so
        # write order is irrelevant; rows the scatter never touches stay
        # zero, matching the never-rendered-slot semantics below.
        rows = jax.lax.optimization_barrier(grad_cm)[:R]
        dst = jax.lax.optimization_barrier(slot_sorted)
        gm_rows = jax.lax.optimization_barrier(
            jnp.zeros((R_seg, LANES), jnp.float32)
            .at[dst].set(rows, mode="drop"))
        per = jax.lax.optimization_barrier(segment_reduce_contiguous(
            gm_rows, gauss_start, num_rendered, n_gauss,
            rm_cols=_round8(F_GEOM - 2 + ch)))
    elif rm_out:
        # grad rows are already row-major 128-lane: the permute is ONE
        # wide gather on the DMA fast path, no boundary transposes
        gm_rows = jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(grad_cm)[_inv_perm()])
        per = jax.lax.optimization_barrier(segment_reduce_contiguous(
            gm_rows, gauss_start, num_rendered, n_gauss,
            rm_cols=_round8(F_GEOM - 2 + ch)))
    else:
        grad_rm = grad_cm.T                               # [R_pad, Gc]
        gm_rows = jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(grad_rm)[_inv_perm()])
        gm_cm = gm_rows.T                                 # [Gc, R_seg]
        per = segment_reduce_contiguous(gm_cm, gauss_start, num_rendered,
                                        n_gauss)
    # re-expand the reduced [6 geom + ch] gradient columns into the packed
    # row layout (cols 6:8 are the geometry pad)
    pieces = [per[:, 0:6], jnp.zeros((n_gauss, 2), jnp.float32),
              per[:, 6:6 + ch]]
    if F - F_GEOM - ch:
        pieces.append(jnp.zeros((n_gauss, F - F_GEOM - ch), jnp.float32))
    d_packed = jnp.concatenate(pieces, axis=-1)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)  # noqa: E731
    zero_b = (f0(jnp.zeros(R, jnp.int32)), f0(jnp.zeros(R, jnp.int32)),
              f0(tile_count), f0(tile_count), f0(gauss_start),
              f0(num_rendered))
    return (d_packed, zero_b)


composite_packed.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles_pallas(binning: Binning, mean2d, conic, opacity,
                           features, settings: RasterSettings):
    """Drop-in for tiled.composite_tiles (same [T, P, CH] output layout) so
    the sharded slab path (parallel/shard.py) can run the Pallas tier."""
    from ..tiled import TiledImages
    log_op = jnp.log(jnp.maximum(opacity, OP_FLOOR))
    packed, _ = pack_gaussian_rows(mean2d, conic, log_op, features)
    sg = jax.lax.stop_gradient
    out = composite_packed(
        packed,
        (sg(binning.gauss_id), sg(binning.slot_sorted),
         sg(binning.tile_start), sg(binning.tile_count),
         sg(binning.gauss_start), sg(binning.num_rendered)),
        features.shape[-1], settings.num_tiles, settings.grid_x)
    return TiledImages(blended=jnp.transpose(out.blended, (0, 2, 1)),
                       final_t=out.final_t)


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
    # log-space opacity feeds the polynomial exponent; the floor keeps dead
    # (zero-opacity) slots finite — their alpha underflows past the 1/255
    # gate, and the max() autodiff gives them exact zero gradient
    log_op = jnp.log(jnp.maximum(opac, OP_FLOOR))
    packed, _ = pack_gaussian_rows(prep.mean2d, prep.conic, log_op, features)

    sg = jax.lax.stop_gradient
    out = composite_packed(
        packed,
        (sg(binning.gauss_id), sg(binning.slot_sorted),
         sg(binning.tile_start), sg(binning.tile_count),
         sg(binning.gauss_start), sg(binning.num_rendered)),
        features.shape[-1], settings.num_tiles, settings.grid_x)

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
