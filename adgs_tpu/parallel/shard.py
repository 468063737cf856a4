"""Tile-sharded rendering and training over a jax.sharding.Mesh.

Design (SURVEY.md §5 "long-context" analog): the pixel x primitive
interaction is partitioned by sharding image TILE ROWS across the mesh's
"tile" axis — the structural counterpart of sequence/context parallelism in
transformers. Each device:

  1. deforms + preprocesses its 1/D slice of the Gaussians,
  2. routes per-primitive render payloads to the slabs their rects
     intersect — either an all-gather (replicated binning input) or, with
     primitive_exchange=True, a duplicateWithKeys-style all-to-all
     (rasterizer_impl.cu:70-111) that moves only the intersecting rows
     (~mean-slabs-touched x N/D instead of (D-1) x N/D per device), and
  3. bins/sorts exactly its slab's instances and composites them.

Slabs are all-gathered into full images for the global losses (image-space
losses like SSIM need cross-slab windows; the gather is a few MB and its
transpose hands each device exactly its slab's cotangent). Parameter
gradients combine via shard_map's transpose: replicated-in params produce a
psum of per-device cotangents, overlapped by XLA with the backward pass.

The window trick: instead of threading a tile-offset through binning and
compositing, each device TRANSLATES screen space (mean2d.y -= row0 * TILE_Y)
and renders into a local grid of `rows_per_dev` tile rows — binning and
compositing are reused untouched.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.camera import Camera
from ..models.env_map import EnvironmentMap
from ..models.gaussians import (GaussianConfig, GaussianParams, GaussianState,
                                activated_scaling, deformed_package,
                                deformed_xyz, obj_mask)
from ..raster import binning as binning_lib
from ..raster import composite as composite_lib
from ..raster import preprocess as prep_lib
from ..raster import tiled as tiled_lib
from ..raster.preprocess import Preprocessed
from ..raster.types import RasterSettings, TILE_Y
from ..render import settings_for_camera
from ..train.config import OptimizationConfig
from ..ops import flow as flow_ops
from ..ops import image as image_ops
from ..train.losses import (FrameBatch, compute_losses,
                            gaussian_term_losses)
from ..train.optim import TrainableState, AdamState, adam_update, lr_tree


def _local_settings(settings: RasterSettings, rows_per_dev: int
                    ) -> RasterSettings:
    return dataclasses.replace(
        settings, image_height=rows_per_dev * TILE_Y,
        image_width=settings.grid_x * 16)


def _window_prep(prep: Preprocessed, local: RasterSettings,
                 row0_tiles: jnp.ndarray) -> Preprocessed:
    """Translate screen-space y so this device's slab starts at y=0, and
    recompute tile rects against the local grid."""
    shift = jnp.stack([jnp.zeros_like(row0_tiles),
                       row0_tiles * TILE_Y]).astype(jnp.float32)
    mean2d = prep.mean2d - shift[None, :]
    rect_min, rect_max = prep_lib.get_rect(mean2d, prep.extent,
                                           local.grid_x, local.grid_y)
    tiles = ((rect_max[..., 0] - rect_min[..., 0])
             * (rect_max[..., 1] - rect_min[..., 1]))
    visible = prep.visible & (tiles > 0)
    return prep._replace(
        mean2d=mean2d, rect_min=rect_min, rect_max=rect_max,
        tiles_touched=jnp.where(visible, tiles, 0).astype(jnp.int32),
        visible=visible)


def _render_local_slab(prep: Preprocessed, settings: RasterSettings,
                       rows_per_dev: int, axis: str,
                       flow_points, semantic,
                       capacity: int, max_per_tile: int, chunk: int,
                       backend: str = "auto"):
    """Per-device: window, bin, composite the local slab. Returns
    ([rows*TILE_Y, W_padded, CH] slab features, [rows*TILE_Y, W_padded] T)."""
    local = _local_settings(settings, rows_per_dev)
    row0 = jax.lax.axis_index(axis) * rows_per_dev
    wprep = _window_prep(prep, local, row0)
    # shard_map body, never vmapped — safe for the pallas/auto expander
    b = binning_lib.bin_gaussians(wprep, local, capacity=capacity,
                                  expander="auto")
    num_rendered = b.num_rendered

    feats = [wprep.rgb, composite_lib.depth_feature(
        wprep.depth, settings.inv_depth)[:, None]]
    if flow_points is not None:
        feats.append(flow_points)
    if semantic is not None:
        feats.append(semantic)
    features = jnp.concatenate(feats, axis=-1)
    opac = jnp.where(wprep.visible, wprep.opacity, 0.0)

    from ..raster.api import resolve_backend
    if resolve_backend(backend) == "pallas":
        from ..raster.pallas import render as pallas_lib
        out = pallas_lib.composite_tiles_pallas(
            b, wprep.mean2d, wprep.conic, opac, features, local)
    else:
        out = tiled_lib.composite_tiles(
            b, wprep.mean2d, wprep.conic, opac, features, local,
            max_chunks=-(-max_per_tile // chunk), chunk=chunk)
    # [T_local, P, CH] -> [rows*TILE_Y, W_pad, CH]
    gy, gx = local.grid_y, local.grid_x
    ch = out.blended.shape[-1]
    slab = out.blended.reshape(gy, gx, TILE_Y, 16, ch).transpose(0, 2, 1, 3, 4)
    slab = slab.reshape(gy * TILE_Y, gx * 16, ch)
    t = out.final_t.reshape(gy, gx, TILE_Y, 16).transpose(0, 2, 1, 3)
    t = t.reshape(gy * TILE_Y, gx * 16)
    return slab, t, wprep.visible, num_rendered


def _slice_gaussian_axis(tree, d: jnp.ndarray, D: int, scene_cap: int,
                         obj_cap: int):
    """Slice every per-Gaussian leading axis to this device's 1/D block.
    Leaves whose leading dim matches neither block size (e.g. the shared
    background trajectory) are left whole."""
    def f(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        n = x.shape[0]
        if n == scene_cap or n == obj_cap:
            per = n // D
            return jax.lax.dynamic_slice_in_dim(x, d * per, per, axis=0)
        if n == scene_cap + obj_cap:
            # combined [scene | obj] layout: slice each block's 1/D chunk
            s = jax.lax.dynamic_slice_in_dim(
                x, d * (scene_cap // D), scene_cap // D, axis=0)
            o = jax.lax.dynamic_slice_in_dim(
                x, scene_cap + d * (obj_cap // D), obj_cap // D, axis=0)
            return jnp.concatenate([s, o], axis=0)
        return x
    return jax.tree.map(f, tree)


def default_exchange_capacity(n_loc: int, D: int) -> int:
    """Initial per-pair exchange capacity: 2x the uniform share, like the
    instance-capacity autotuner's headroom (overflow-flagged, grown by the
    trainer when the flag fires). The all_to_all send buffer and its
    bucket scatter both scale with this (the payload a2a is the top
    collective in the D=8 profile), and the mean slab span of a 3-sigma
    rect is only ~1.1-1.5 — 2x covers it with margin while halving the
    round-4 4x default's traffic."""
    return max(64, -(-2 * n_loc // D) // 8 * 8)


def _exchange_primitives(payload, dev_lo, dev_hi, D: int, axis: str,
                         cap_pair: int):
    """duplicateWithKeys across the mesh (rasterizer_impl.cu:70-111 analog):
    each device sends every one of its primitives ONLY to the devices whose
    tile-row slab the primitive's rect intersects, as one ragged-emulating
    all-to-all with fixed per-pair capacity.

    payload: [n_loc, F] per-primitive render columns; dev_lo/dev_hi:
    [n_loc] inclusive destination-device range (lo > hi = send nowhere).
    Returns ([D * cap_pair, F] received rows, [D * cap_pair] valid,
    overflow flag). Comm volume is ~(mean slabs touched) x n_loc rows
    instead of the all-gather's (D-1) x n_loc.

    Bucket packing is ONE cumsum + per-destination scatter-sets
    (per-destination argsorts would compile as D full sorts — XLA TPU
    sorts cost 20-75s each to compile, CLAUDE.md). Rows sent to several
    slabs are scattered once per destination directly from the payload
    (no [n*D, F] repeat intermediate); the scatters' transpose SUMS the
    per-destination cotangents — grads stay exact.

    Returns ([D * cap_pair, F] received rows, overflow flag). There is no
    separate validity exchange: unfilled send slots stay exactly zero, so
    the caller's vis column (sent as 1.0 for every real row) doubles as
    the valid mask — one all_to_all instead of two (round-5 collective
    diet; every collective is a device rendezvous)."""
    n, F = payload.shape
    e_rng = jnp.arange(D, dtype=jnp.int32)
    m = (dev_lo[:, None] <= e_rng) & (e_rng <= dev_hi[:, None])  # [n, D]
    pos = jnp.cumsum(m.astype(jnp.int32), axis=0) - 1   # slot within bucket
    counts = 1 + pos[-1]                                # [D]
    dest = jnp.where(m & (pos < cap_pair),
                     e_rng * cap_pair + pos, D * cap_pair)       # [n, D]
    send = jnp.zeros((D * cap_pair + 1, F), payload.dtype)
    for e in range(D):
        # bucket regions are disjoint across e; non-members share the
        # sink row (sliced off below), so indices are neither sorted nor
        # unique as far as XLA is concerned
        send = send.at[dest[:, e]].set(payload)
    send = send[:D * cap_pair]
    overflow = jnp.max(counts) > cap_pair
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=True)
    return recv, jax.lax.psum(overflow.astype(jnp.int32), axis) > 0


def _device_render(params, state, screen_offset, *, config, settings,
                   time, flow_time, render_objmask, D, axis, rows_per_dev,
                   capacity, max_per_tile, chunk, backend, can_shard_prims,
                   primitive_exchange, exchange_capacity,
                   gather_pkg: bool = True):
    """Per-device render body shared by the gathered-loss and slab-loss
    paths: deform + preprocess the local 1/D primitive slice, route
    payloads (all-gather or duplicateWithKeys exchange), bin + composite
    the local tile-row slab.

    Returns (slab [rows*TY, W_pad, CH], t [rows*TY, W_pad], visible [N],
    radii [N], pkg|None, ex_overflow, nrend_local)."""
    if can_shard_prims:
        d = jax.lax.axis_index(axis)
        p_loc = _slice_gaussian_axis(params, d, D,
                                     params.scene_capacity,
                                     params.obj_capacity)
        s_loc = _slice_gaussian_axis(state, d, D, params.scene_capacity,
                                     params.obj_capacity)
        so_loc = _slice_gaussian_axis(screen_offset, d, D,
                                      params.scene_capacity,
                                      params.obj_capacity)
        pkg_loc = deformed_package(p_loc, s_loc, config, time)
        flow_loc = (deformed_xyz(p_loc, config, flow_time)
                    if flow_time is not None else None)
        sem_loc = (obj_mask(p_loc).astype(jnp.float32)[:, None]
                   if render_objmask else None)
        prep_loc = prep_lib.preprocess(
            pkg_loc["xyz"], activated_scaling(p_loc), pkg_loc["rotation"],
            pkg_loc["opacity"], pkg_loc["shs"], settings,
            screen_offset=so_loc, active_mask=s_loc.alive)

        def gather_blocks(x):
            # per-device [Ns/D + No/D] halves -> full [Ns + No] order
            g = jax.lax.all_gather(x, axis)          # [D, n/D, ...]
            ns = params.scene_capacity // D
            scene = g[:, :ns].reshape((-1,) + x.shape[1:])
            objp = g[:, ns:].reshape((-1,) + x.shape[1:])
            return jnp.concatenate([scene, objp], axis=0)

        # the small global-need fields travel by all-gather either way
        # (radii for densify stats; pkg only when the caller needs it)
        pkg = jax.tree.map(gather_blocks, pkg_loc) if gather_pkg else None

        if primitive_exchange:
            # duplicateWithKeys across the mesh: route each primitive's
            # RENDER payload only to the slabs its rect intersects
            n_loc = prep_loc.mean2d.shape[0]
            cap_pair = (exchange_capacity
                        or default_exchange_capacity(n_loc, D))
            rlo = prep_loc.rect_min[:, 1] // rows_per_dev
            rhi = jnp.clip((prep_loc.rect_max[:, 1] - 1) // rows_per_dev,
                           0, D - 1)
            vis0 = prep_loc.visible
            dev_lo = jnp.where(vis0, rlo, 1).astype(jnp.int32)
            dev_hi = jnp.where(vis0, rhi, 0).astype(jnp.int32)
            cols = [prep_loc.mean2d, prep_loc.conic,
                    prep_loc.depth[:, None], prep_loc.rgb,
                    prep_loc.opacity[:, None], prep_loc.extent,
                    vis0.astype(jnp.float32)[:, None]]
            if flow_loc is not None:
                cols.append(flow_loc)
            if sem_loc is not None:
                cols.append(sem_loc)
            payload = jnp.concatenate(cols, axis=-1)
            rows, ex_overflow = _exchange_primitives(
                payload, dev_lo, dev_hi, D, axis, cap_pair)
            # unfilled exchange slots are exact zeros, so the vis column
            # (1.0 on every sent row) is also the slot-valid mask
            visible_r = rows[:, 12] > 0.5
            nr = rows.shape[0]
            zi = jnp.zeros((nr, 2), jnp.int32)
            prep = Preprocessed(
                mean2d=rows[:, 0:2], depth=rows[:, 5],
                conic=rows[:, 2:5], opacity=rows[:, 9],
                rgb=rows[:, 6:9], radii=jnp.zeros((nr,), jnp.float32),
                extent=rows[:, 10:12], rect_min=zi, rect_max=zi,
                tiles_touched=jnp.zeros((nr,), jnp.int32),
                visible=visible_r)
            c = 13
            flow_points = semantic = None
            if flow_loc is not None:
                flow_points = rows[:, c:c + 3]
                c += 3
            if sem_loc is not None:
                semantic = rows[:, c:c + 1]
            radii_full = gather_blocks(prep_loc.radii)
            slab, t, _, nrend = _render_local_slab(
                prep, settings, rows_per_dev, axis, flow_points,
                semantic, capacity, max_per_tile, chunk, backend=backend)
            return (slab, t, radii_full > 0, radii_full, pkg,
                    ex_overflow, nrend)

        prep = jax.tree.map(gather_blocks, prep_loc)
        flow_points = (gather_blocks(flow_loc)
                       if flow_loc is not None else None)
        semantic = (gather_blocks(sem_loc)
                    if sem_loc is not None else None)
    else:
        pkg = deformed_package(params, state, config, time)
        flow_points = (deformed_xyz(params, config, flow_time)
                       if flow_time is not None else None)
        semantic = (obj_mask(params).astype(jnp.float32)[:, None]
                    if render_objmask else None)
        prep = prep_lib.preprocess(
            pkg["xyz"], activated_scaling(params), pkg["rotation"],
            pkg["opacity"], pkg["shs"], settings,
            screen_offset=screen_offset, active_mask=state.alive)
        if not gather_pkg:
            pkg = None
    slab, t, visible, nrend = _render_local_slab(
        prep, settings, rows_per_dev, axis, flow_points, semantic,
        capacity, max_per_tile, chunk, backend=backend)
    # visible anywhere -> visible (for densification stats)
    visible = jax.lax.psum(visible.astype(jnp.int32), axis) > 0
    return slab, t, visible, prep.radii, pkg, jnp.asarray(False), nrend


def sharded_render_images(
    params: GaussianParams, state: GaussianState, config: GaussianConfig,
    camera: Camera, mesh: Mesh, axis: str = "tile",
    env_map: Optional[EnvironmentMap] = None,
    cam_rays: Optional[jnp.ndarray] = None,
    flow_time: Optional[jnp.ndarray] = None,
    render_objmask: bool = False,
    screen_offset: Optional[jnp.ndarray] = None,
    active_sh_degree: Optional[int] = None,
    inv_depth: bool = True,
    capacity: int = 1 << 18, max_per_tile: int = 2048, chunk: int = 32,
    shard_primitives: bool = True,
    primitive_exchange: bool = False,
    exchange_capacity: Optional[int] = None,
    backend: str = "auto",
) -> dict:
    """Full multi-device render returning the same dict as render().

    Two sharded axes of work ride the SAME mesh axis:
      - primitive axis: each device deforms + preprocesses only its 1/D
        slice of the Gaussians, and per-Gaussian quantities are all-gathered
        (the transpose reduces cotangents back to the owning shard);
      - pixel axis: each device bins + composites its tile-row slab.
    """
    sh_degree = (active_sh_degree if active_sh_degree is not None
                 else config.sh_degree)
    settings = settings_for_camera(camera, sh_degree, inv_depth)
    D = mesh.shape[axis]
    rows_per_dev = -(-settings.grid_y // D)
    can_shard_prims = (shard_primitives
                       and params.scene_capacity % D == 0
                       and params.obj_capacity % D == 0)

    def inner(params, state, screen_offset):
        (slab, t, visible, radii, pkg, ex_overflow,
         nrend) = _device_render(
            params, state, screen_offset, config=config, settings=settings,
            time=camera.time, flow_time=flow_time,
            render_objmask=render_objmask, D=D, axis=axis,
            rows_per_dev=rows_per_dev, capacity=capacity,
            max_per_tile=max_per_tile, chunk=chunk, backend=backend,
            can_shard_prims=can_shard_prims,
            primitive_exchange=primitive_exchange,
            exchange_capacity=exchange_capacity)
        slabs = jax.lax.all_gather(slab, axis)      # [D, rows*TY, W_pad, CH]
        ts = jax.lax.all_gather(t, axis)
        nrend = jax.lax.pmax(nrend, axis)
        return slabs, ts, visible, radii, pkg, ex_overflow, nrend

    spec_rep = P()
    # jit the shard_map program: called eagerly it would dispatch the inner
    # graph op-by-op through the shard_map interpreter (~100x slower for
    # standalone render calls; inside a jitted train step this jit is a
    # no-op inline)
    fn = jax.jit(shard_map(
        inner, mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep),
        out_specs=(P(axis), P(axis), spec_rep, spec_rep, spec_rep,
                   spec_rep, spec_rep),
        check_vma=False))
    if screen_offset is None:
        screen_offset = jnp.zeros((params.capacity, 2), dtype=jnp.float32)
    slabs, ts, visible, radii, pkg, ex_overflow, num_rendered = fn(
        params, state, screen_offset)

    H, W = settings.image_height, settings.image_width
    ch = slabs.shape[-1]
    full = slabs.reshape(-1, slabs.shape[-2], ch)[:H, :W]   # [H, W, CH]
    t_full = ts.reshape(-1, ts.shape[-1])[:H, :W]

    color = full[..., :3].transpose(2, 0, 1)
    depth = full[..., 3]
    chc = 4
    img_flow = img_sem = None
    if flow_time is not None:
        img_flow = full[..., chc:chc + 3].transpose(2, 0, 1)
        chc += 3
    if render_objmask:
        img_sem = full[..., chc:chc + 1].transpose(2, 0, 1)
    opacity = 1.0 - t_full

    if env_map is not None and cam_rays is not None:
        background = env_map.image_background(cam_rays, camera.world_view)
        rendered = color + (1.0 - opacity)[None] * background
    else:
        background = jnp.zeros_like(color)
        rendered = color

    return {
        "render": rendered,
        "foreground": color,
        "background": background,
        "depth": depth,
        "img_opacity": opacity,
        "img_flow": img_flow,
        "img_semantic": img_sem,
        "radii": radii,
        "visibility_filter": radii > 0,
        # True when the fixed per-pair exchange capacity dropped rows —
        # callers grow exchange_capacity the way the trainer grows the
        # instance capacity (always False on the all-gather path)
        "exchange_overflow": ex_overflow,
        # max over devices: drives the trainer's instance-capacity autotune
        "num_rendered": num_rendered,
        **pkg,
    }


def sharded_render_color(params, state, config, camera, mesh, **kw):
    return sharded_render_images(params, state, config, camera, mesh, **kw)["render"]


def make_sharded_train_step(
    config: GaussianConfig,
    opt: OptimizationConfig,
    frame_gap: float,
    scene_extent: float,
    cameras_extent: float,
    mesh: Mesh,
    axis: str = "tile",
    capacity: int = 1 << 18,
    max_per_tile: int = 2048,
    chunk: int = 32,
    inv_depth: bool = True,
    backend: str = "auto",
    primitive_exchange: bool = False,
    exchange_capacity: Optional[int] = None,
    loss_mode: str = "slab",
    data_axis: Optional[str] = None,
):
    """Sharded analog of train.step.make_train_step: one jitted multi-device
    program. Same call signature as the single-device step — the Trainer
    swaps it in when built with a mesh.

    loss_mode:
      - "slab" (default): image losses computed per device on its tile-row
        slab — SSIM via an 11-px halo exchange (lax.ppermute of boundary
        rows), everything else as psum'd sufficient statistics. No
        full-image all-gather and no replicated loss stack — the round-2
        scaling ceiling (VERDICT weak #2).
      - "gathered": all-gather the slabs and run the global loss stack
        replicated (the round-2 behaviour; parity reference).

    data_axis: camera-batch data parallelism on a 2-D mesh (slab mode
    only) — see _make_slab_train_step.
    """
    if loss_mode == "slab":
        return _make_slab_train_step(
            config, opt, frame_gap, scene_extent, cameras_extent, mesh,
            axis, capacity, max_per_tile, chunk, inv_depth, backend,
            primitive_exchange, exchange_capacity, data_axis=data_axis)
    if data_axis is not None:
        raise ValueError("data_axis requires loss_mode='slab'")

    render_objmask = opt.lambda_obj > 0.0

    @functools.partial(jax.jit, static_argnames=("active_sh_degree",))
    def step(params: GaussianParams, env: EnvironmentMap,
             opt_state: AdamState, state: GaussianState,
             camera: Camera, batch: FrameBatch, cam_rays: jnp.ndarray,
             iteration: jnp.ndarray, active_sh_degree: int = 3):
        so = jnp.zeros((params.capacity, 2), dtype=jnp.float32)

        def loss_fn(trainables: TrainableState, so):
            flow_time = batch.flow.time if batch.flow is not None else None
            pkg = sharded_render_images(
                trainables.gaussians, state, config, camera, mesh, axis,
                env_map=trainables.env, cam_rays=cam_rays,
                flow_time=flow_time, render_objmask=render_objmask,
                screen_offset=so, active_sh_degree=active_sh_degree,
                inv_depth=inv_depth, capacity=capacity,
                max_per_tile=max_per_tile, chunk=chunk, backend=backend,
                primitive_exchange=primitive_exchange,
                exchange_capacity=exchange_capacity)
            total, logs = compute_losses(
                pkg, batch, trainables.gaussians, state, config, opt,
                frame_gap, scene_extent)
            # autotune signals for the trainer (instance + exchange caps)
            logs = dict(logs, num_rendered=pkg["num_rendered"],
                        exchange_overflow=pkg["exchange_overflow"])
            return total, (logs, pkg["radii"], pkg["visibility_filter"])

        trainables = TrainableState(gaussians=params, env=env)
        (loss, (logs, radii, vis)), (grads, so_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(trainables, so)

        lrs = lr_tree(opt, scene_extent, cameras_extent, iteration)
        new_trainables, new_opt_state = adam_update(
            trainables, grads, opt_state, lrs)

        visf = vis.astype(jnp.float32)
        snorm = jnp.linalg.norm(so_grad, axis=-1)
        new_state = dataclasses.replace(
            state,
            max_radii2d=jnp.maximum(state.max_radii2d,
                                    jnp.where(vis, radii.astype(jnp.float32),
                                              0.0)),
            xyz_grad_accum=state.xyz_grad_accum + snorm * visf,
            denom=state.denom + visf,
        )
        return (new_trainables.gaussians, new_trainables.env, new_opt_state,
                new_state, logs)

    return step


_SSIM_HALO = 5   # 11x11 window reach


def _halo_rows(x, halo: int, axis: str, D: int, row_axis: int):
    """Extend a per-device slab with `halo` boundary rows from each mesh
    neighbour along `row_axis`. Edge devices receive ZEROS — exactly the
    SAME-zero-pad semantics the full-image SSIM conv sees at the image
    border, so halo + crop is value-identical to the global computation."""
    def take(sl):
        idx = [slice(None)] * x.ndim
        idx[row_axis] = sl
        return x[tuple(idx)]
    down = [(i, i + 1) for i in range(D - 1)]
    up = [(i + 1, i) for i in range(D - 1)]
    prev_bot = jax.lax.ppermute(take(slice(-halo, None)), axis, down)
    next_top = jax.lax.ppermute(take(slice(0, halo)), axis, up)
    return jnp.concatenate([prev_bot, x, next_top], axis=row_axis)


def _slab_image_losses(rendered, depth_s, opac_s, flow_img_s, sem_s,
                       batch_sl, opt, scene_extent, axis, D, H, W, row0):
    """All image-loss terms from this device's slab + collectives:
    pixel-local terms as psum'd sums, SSIM via halo exchange, the depth
    scale/shift alignment via psum'd normal-equation moments. Returns
    (total, logs) — replicated scalars, numerically matching
    train.losses.compute_losses up to f32 reassociation of the sums.

    rendered: [3, rows, W]; depth/opac: [rows, W]; batch_sl: this
    device's row slice (zero-padded past the true image height H).

    Collective diet (round 5): every psum is a device rendezvous, so all
    data-independent scalar sums ride ONE stacked psum (elementwise — the
    per-term summation order, and therefore every value, is unchanged);
    only the depth alignment needs a second round (its residual depends
    on the psum'd normal-equation moments). The SSIM halo likewise moves
    rendered+gt in one stacked ppermute pair instead of two."""
    rows = rendered.shape[1]
    rmask = ((row0 + jnp.arange(rows)) < H).astype(jnp.float32)
    m1 = rmask[None, :, None]
    m2 = rmask[:, None]
    npx = float(H * W)
    logs = {}

    def ps(v):
        return jax.lax.psum(v, axis)

    gt = batch_sl.image
    part = [jnp.sum(jnp.abs(rendered - gt) * m1)]          # l1

    both_h = _halo_rows(jnp.concatenate([rendered * m1, gt * m1], axis=0),
                        _SSIM_HALO, axis, D, row_axis=1)
    smap = image_ops.ssim_map(both_h[:3], both_h[3:]
                              )[0][:, _SSIM_HALO:-_SSIM_HALO]
    part.append(jnp.sum(smap * m1))                        # ssim

    use_depth = opt.lambda_depth > 0.0
    if use_depth:
        pred, targ = depth_s, batch_sl.depth
        mask = jnp.broadcast_to(m2, pred.shape)
        part += [jnp.sum(mask * pred * pred), jnp.sum(mask * pred),
                 jnp.sum(mask), jnp.sum(mask * pred * targ),
                 jnp.sum(mask * targ)]
    use_flow = opt.lambda_flow > 0.0 and batch_sl.flow is not None
    if use_flow:
        fpk = batch_sl.flow
        err_sum, count = flow_ops.flow_loss_sums(
            flow_img_s, fpk.flow, fpk.vis, fpk.K, fpk.R, fpk.T,
            opac_s, dist=scene_extent * 1e-3, full_hw=(H, W),
            pix_mask=jnp.broadcast_to(m2, fpk.vis.shape))
        part += [err_sum, count.astype(jnp.float32)]
    use_obj = opt.lambda_obj > 0.0
    if use_obj:
        predo = jnp.clip(sem_s[0], 1e-3, 1.0 - 1e-3)
        t_ob = (batch_sl.semantic > 0).astype(jnp.float32)
        part.append(-jnp.sum((t_ob * jnp.log(predo)
                              + (1 - t_ob) * jnp.log(1 - predo)) * m2))
    use_sky = opt.lambda_sky > 0.0
    if use_sky:
        preds = 1.0 - jnp.clip(opac_s, 1e-3, 1.0 - 1e-3)
        part.append(-jnp.sum((batch_sl.sky * jnp.log(preds)
                              + (1 - batch_sl.sky)
                              * jnp.log(1 - preds)) * m2))

    S = ps(jnp.stack(part))
    c = 0

    def nxt(k=1):
        nonlocal c
        c += k
        return S[c - k] if k == 1 else S[c - k:c]

    l1 = nxt() / (3.0 * npx)
    logs["l1_loss"] = l1
    dssim = 1.0 - nxt() / (3.0 * npx)
    logs["dssim_loss"] = dssim
    total = (1.0 - opt.lambda_dssim) * opt.lambda_l1 * l1 \
        + opt.lambda_dssim * dssim

    if use_depth:
        a00, a01, a11, b0, b1 = (nxt() for _ in range(5))
        det = a00 * a11 - a01 * a01
        safe = jnp.where(det == 0.0, 1.0, det)
        scale = jnp.where(det == 0.0, 0.0, (a11 * b0 - a01 * b1) / safe)
        shift = jnp.where(det == 0.0, 0.0, (-a01 * b0 + a00 * b1) / safe)
        sums = ps(jnp.stack([
            jnp.sum(jnp.abs(scale * pred + shift - targ) * mask),
            jnp.sum(mask)]))
        d = sums[0] / jnp.maximum(sums[1], 1.0)
        total = total + opt.lambda_depth * d
        logs["depth_loss"] = d

    if use_flow:
        fsum, fcnt = nxt(), nxt()
        fl = jnp.where(fcnt > 0, fsum / jnp.maximum(fcnt, 1.0), 0.0)
        if batch_sl.flow_valid is not None:
            fl = jnp.where(batch_sl.flow_valid, fl, 0.0)
        total = total + opt.lambda_flow * fl
        logs["flow_loss"] = fl

    if use_obj:
        ob = nxt() / npx
        total = total + opt.lambda_obj * ob
        logs["obj_loss"] = ob

    if use_sky:
        sk = nxt() / npx
        total = total + opt.lambda_sky * sk
        logs["sky_loss"] = sk

    return total, logs


def sharded_adam_update(trainables: TrainableState, grads: TrainableState,
                        opt_state: AdamState, lrs: TrainableState,
                        mesh: Mesh) -> tuple[TrainableState, AdamState]:
    """ZeRO-style optimizer sharding: every device updates a 1/D slice of
    each parameter leaf (sliced along the first axis divisible by the
    device count — gaussian capacity for params, the 8192 row axis for
    the env grid), and the out-spec reassembles the full leaves (an
    all-gather on hardware). The replicated Adam update is O(N) compute
    + 3x O(N) HBM per device regardless of mesh size — one of the two
    non-scaling tails of the slab step (the other being the grad psum,
    which is inherent to replicated parameters). Indivisible leaves
    (scalars, tiny vectors) stay replicated."""
    D = 1
    for s in mesh.shape.values():
        D *= s
    axes = tuple(mesh.axis_names)

    def spec_of(x):
        x = jnp.asarray(x)
        for i, s in enumerate(x.shape):
            if s >= D and s % D == 0:
                return P(*([None] * i + [axes]))
        return P()

    p_specs = jax.tree.map(spec_of, trainables)
    g_specs = jax.tree.map(spec_of, grads)
    lr_specs = jax.tree.map(lambda _: P(), lrs)
    os_specs = AdamState(m=p_specs, v=p_specs, count=P())

    def inner(t, g, os_, lr):
        return adam_update(t, g, os_, lr)

    fn = shard_map(inner, mesh=mesh,
                   in_specs=(p_specs, g_specs, os_specs, lr_specs),
                   out_specs=(p_specs, os_specs), check_vma=False)
    return fn(trainables, grads, opt_state, lrs)


def _make_slab_train_step(config, opt, frame_gap, scene_extent,
                          cameras_extent, mesh, axis, capacity,
                          max_per_tile, chunk, inv_depth, backend,
                          primitive_exchange, exchange_capacity,
                          data_axis: Optional[str] = None):
    """Sharded train step with SLAB-LOCAL losses: render, env-background
    sampling AND the image-loss stack all stay on each device's tile-row
    slab (the env sample and loss tail were replicated full-image work in
    the gathered mode — the dominant non-scaling term at D >= 4).

    data_axis: optional second mesh axis for CAMERA-BATCH data parallelism
    (SURVEY §2.3 DP row composed with tile sharding on a 2-D mesh). When
    set, `camera`, `batch` and `cam_rays` carry a leading B axis with
    B == mesh.shape[data_axis]; each data row trains one camera on the
    production (pallas) path — no vmap over the kernels — and the step
    behaves like B reference iterations of densification statistics
    (grad norms and visibility summed over cameras, radii maxed), with
    the loss the camera-mean so thresholds keep their meaning."""
    render_objmask = opt.lambda_obj > 0.0
    rep = P()
    batched = data_axis is not None

    def ds(*rest):
        """Prepend the data axis to a PartitionSpec when batched."""
        return P(data_axis, *rest) if batched else P(*rest)

    @functools.partial(jax.jit, static_argnames=("active_sh_degree",))
    def step(params: GaussianParams, env: EnvironmentMap,
             opt_state: AdamState, state: GaussianState,
             camera: Camera, batch: FrameBatch, cam_rays: jnp.ndarray,
             iteration: jnp.ndarray, active_sh_degree: int = 3):
        D = mesh.shape[axis]
        B = mesh.shape[data_axis] if batched else 1
        H, W = camera.height, camera.width
        grid_y = (H + TILE_Y - 1) // TILE_Y
        rows_per_dev = -(-grid_y // D)
        rows = rows_per_dev * TILE_Y
        H_pad = D * rows
        has_flow = batch.flow is not None
        can_shard_prims = (params.scene_capacity % D == 0
                           and params.obj_capacity % D == 0)
        off = 1 if batched else 0   # leading B axis on batch/rays leaves

        def pad_rows(x, row_axis):
            pads = [(0, 0)] * x.ndim
            pads[row_axis + off] = (0, H_pad - H)
            return jnp.pad(x, pads)

        batch_p = batch._replace(
            image=pad_rows(batch.image, 1),
            depth=pad_rows(batch.depth, 0),
            sky=pad_rows(batch.sky, 0),
            semantic=pad_rows(batch.semantic, 0),
            flow=None if not has_flow else batch.flow._replace(
                flow=pad_rows(batch.flow.flow, 1),
                vis=pad_rows(batch.flow.vis, 0)))
        rays_p = pad_rows(cam_rays, 0)
        so_shape = ((B,) if batched else ()) + (params.capacity, 2)
        so = jnp.zeros(so_shape, dtype=jnp.float32)

        # Packed-trainables boundary (round-5 collective diet): crossing
        # the shard_map boundary as ONE concatenated f32 vector makes the
        # replicated-in transpose emit ONE grad psum instead of one per
        # param leaf (~20 device rendezvous per step on the CPU mesh; on
        # hardware it is the difference between one fused ring allreduce
        # and a launch per leaf). Bitwise-neutral: psum of a concatenation
        # sums the same elements in the same device order.
        trainables = TrainableState(gaussians=params, env=env)
        flat0, t_def = jax.tree.flatten(trainables)
        use_pack = (int(os.environ.get("ADGS_PACK_GRADS", "1")) != 0
                    and all(l.dtype == jnp.float32 for l in flat0))
        shapes = [l.shape for l in flat0]
        sizes = [int(l.size) for l in flat0]

        def _pack(tree):
            return jnp.concatenate(
                [x.reshape(-1) for x in jax.tree.leaves(tree)])

        # custom_vjp: XLA transposes the naive slice-unpack into one
        # pad+add of the FULL vector PER LEAF (~20 full-length passes,
        # profiled at ~117 ms/device-step on the CPU mesh); the true
        # adjoint is a single concat of the leaf cotangents.
        @jax.custom_vjp
        def _unpack(vec):
            out, o = [], 0
            for s, sz in zip(shapes, sizes):
                out.append(vec[o:o + sz].reshape(s))
                o += sz
            return jax.tree.unflatten(t_def, out)

        def _unpack_fwd(vec):
            return _unpack(vec), None

        def _unpack_bwd(_, ct):
            return (_pack(ct),)

        _unpack.defvjp(_unpack_fwd, _unpack_bwd)

        def inner(tr_in, so_, cam, rays_sl, batch_sl, state_):
            trainables = _unpack(tr_in) if use_pack else tr_in
            if batched:   # squeeze this data row's camera block
                cam, so_, rays_sl, batch_sl = jax.tree.map(
                    lambda x: x[0], (cam, so_, rays_sl, batch_sl))
            settings = settings_for_camera(cam, active_sh_degree, inv_depth)
            flow_time = batch_sl.flow.time if has_flow else None
            p = trainables.gaussians
            slab, t, visible, radii, _, ex_overflow, nrend = _device_render(
                p, state_, so_, config=config, settings=settings,
                time=cam.time, flow_time=flow_time,
                render_objmask=render_objmask, D=D, axis=axis,
                rows_per_dev=rows_per_dev, capacity=capacity,
                max_per_tile=max_per_tile, chunk=chunk, backend=backend,
                can_shard_prims=can_shard_prims,
                primitive_exchange=primitive_exchange,
                exchange_capacity=exchange_capacity, gather_pkg=False)
            color = jnp.transpose(slab[:, :W, :3], (2, 0, 1))  # [3,rows,W]
            depth_s = slab[:, :W, 3]
            chc = 4
            flow_img_s = sem_s = None
            if has_flow:
                flow_img_s = jnp.transpose(slab[:, :W, chc:chc + 3],
                                           (2, 0, 1))
                chc += 3
            if render_objmask:
                sem_s = jnp.transpose(slab[:, :W, chc:chc + 1], (2, 0, 1))
            t_s = t[:, :W]
            opac_s = 1.0 - t_s
            # env background on THIS slab's rays only: 1/D of the frame
            # instead of a replicated full-image sample
            bg = trainables.env.image_background(rays_sl, cam.world_view)
            rendered = color + t_s[None] * bg
            row0 = jax.lax.axis_index(axis) * rows
            total_img, logs = _slab_image_losses(
                rendered, depth_s, opac_s, flow_img_s, sem_s, batch_sl,
                opt, scene_extent, axis, D, H, W, row0)
            nrend = jax.lax.pmax(nrend, axis)
            if batched:
                # loss/logs: camera means (replicated outputs); stats keep
                # their per-camera B axis for B-iterations-worth semantics
                total_img = jax.lax.pmean(total_img, data_axis)
                logs = jax.tree.map(
                    lambda v: jax.lax.pmean(v, data_axis), logs)
                nrend = jax.lax.pmax(nrend, data_axis)
                ex_overflow = (jax.lax.pmax(
                    ex_overflow.astype(jnp.int32), data_axis) > 0)
                radii, visible = radii[None], visible[None]
            return total_img, logs, radii, visible, ex_overflow, nrend

        b_specs = FrameBatch(
            image=ds(None, axis), depth=ds(axis), sky=ds(axis),
            semantic=ds(axis),
            flow=None if not has_flow else batch_p.flow._replace(
                time=ds(), K=ds(), R=ds(), T=ds(), flow=ds(None, axis),
                vis=ds(axis)),
            flow_valid=None if batch_p.flow_valid is None else ds())
        fn = shard_map(
            inner, mesh=mesh,
            in_specs=(rep, ds(), ds(), ds(axis), b_specs, rep),
            out_specs=(rep, rep, ds(), ds(), rep, rep),
            check_vma=False)

        def loss_fn(tr_in, so_):
            total_img, logs, radii, vis, exo, nrend = fn(
                tr_in, so_, camera, rays_p, batch_p, state)
            tr = _unpack(tr_in) if use_pack else tr_in
            g_total, g_logs = gaussian_term_losses(
                tr.gaussians, state, opt, frame_gap)
            total = total_img + g_total
            logs = dict(logs, **g_logs, total_loss=total,
                        num_rendered=nrend, exchange_overflow=exo)
            return total, (logs, radii, vis)

        tr0 = _pack(trainables) if use_pack else trainables
        (loss, (logs, radii, vis)), (grads, so_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(tr0, so)
        if use_pack:
            grads = _unpack(grads)

        lrs = lr_tree(opt, scene_extent, cameras_extent, iteration)
        new_trainables, new_opt_state = sharded_adam_update(
            trainables, grads, opt_state, lrs, mesh)

        visf = vis.astype(jnp.float32)
        if batched:
            # dL/dso scales with 1/B through the camera mean; undo it so
            # densify thresholds keep their single-camera meaning, then
            # accumulate the batch like B reference iterations
            snorm = jnp.linalg.norm(so_grad * B, axis=-1)       # [B, N]
            radii_max = jnp.max(
                jnp.where(vis, radii.astype(jnp.float32), 0.0), axis=0)
            grad_acc = jnp.sum(snorm * visf, axis=0)
            den_acc = jnp.sum(visf, axis=0)
        else:
            snorm = jnp.linalg.norm(so_grad, axis=-1)
            radii_max = jnp.where(vis, radii.astype(jnp.float32), 0.0)
            grad_acc = snorm * visf
            den_acc = visf
        new_state = dataclasses.replace(
            state,
            max_radii2d=jnp.maximum(state.max_radii2d, radii_max),
            xyz_grad_accum=state.xyz_grad_accum + grad_acc,
            denom=state.denom + den_acc,
        )
        return (new_trainables.gaussians, new_trainables.env, new_opt_state,
                new_state, logs)

    return step
