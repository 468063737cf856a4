"""Render bridge: model + environment map -> rasterizer -> composited frame.

Parity with gaussian_renderer/__init__.py:18-115 (render): evaluates the
temporal deformation at the camera's time, optionally evaluates flow points
at the flow package's time, rasterizes with depth/opacity/flow/semantic
targets, and composites the environment-map sky behind the splatted
foreground via accumulated opacity (:93-94).

The reference's `screenspace_points` retain_grad trick (:26-30) becomes an
explicit zero `screen_offset` input: take grad w.r.t. it to obtain
dL/dmean2D for densification stats.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from .core.camera import Camera
from .models.env_map import EnvironmentMap
from .models.gaussians import (
    GaussianConfig, GaussianParams, GaussianState, activated_scaling,
    deformed_package, deformed_xyz, obj_mask,
)
from .raster.api import rasterize
from .raster.types import RasterSettings


def settings_for_camera(cam: Camera, sh_degree: int,
                        inv_depth: bool = True,
                        scale_modifier: float = 1.0) -> RasterSettings:
    return RasterSettings(
        viewmatrix=cam.world_view,
        projmatrix=cam.full_proj,
        campos=cam.camera_center,
        bg=jnp.zeros(3, dtype=jnp.float32),
        image_height=cam.height,
        image_width=cam.width,
        tanfovx=cam.tan_fovx,
        tanfovy=cam.tan_fovy,
        sh_degree=sh_degree,
        scale_modifier=scale_modifier,
        inv_depth=inv_depth,
    )


def compute_binning(
    camera: Camera,
    params: GaussianParams,
    state: GaussianState,
    config: GaussianConfig,
    active_sh_degree: Optional[int] = None,
    inv_depth: bool = True,
    scaling_modifier: float = 1.0,
    capacity: int = 1 << 18,
    expander: str = "auto",
):
    """The non-differentiable half of a render: deform + preprocess + tile
    binning. Jit this separately and feed the result to render(...,
    precomputed_binning=...) — the preprocess is recomputed inside the
    differentiable step (deterministic, same values).

    expander="auto" runs the windowed one-hot Pallas expansion with a
    runtime fallback to the XLA path (raster/binning.py docstring); this
    staged entry is never vmapped, so the lax.cond stays a real branch."""
    from .raster import binning as binning_lib
    from .raster import preprocess as prep_lib

    sh_degree = (active_sh_degree if active_sh_degree is not None
                 else config.sh_degree)
    settings = settings_for_camera(camera, sh_degree, inv_depth,
                                   scaling_modifier)
    pkg = deformed_package(params, state, config, camera.time)
    # binning consumes geometry only (rects, depth, tiles_touched) — skip
    # the SH color evaluation (shs=None), which only the render step needs
    prep = prep_lib.preprocess(
        pkg["xyz"], activated_scaling(params), pkg["rotation"],
        pkg["opacity"], None, settings, active_mask=state.alive)
    return binning_lib.bin_gaussians(prep, settings, capacity=capacity,
                                     expander=expander)


def make_staged_render_fn(config: GaussianConfig,
                          active_sh_degree: Optional[int] = None,
                          inv_depth: bool = True,
                          backend: str = "auto",
                          capacity: int = 1 << 18,
                          max_per_tile: int = 2048,
                          chunk: int = 32,
                          render_objmask: bool = False):
    """Jitted (binning, render) pair for inference/eval: two bounded
    compiles instead of one monolithic program (critical on the TPU
    remote-compile path — see CLAUDE.md). Returns
    fn(camera, params, state, env, cam_rays) -> render() dict."""
    import jax

    @jax.jit
    def bin_f(camera, params, state):
        return compute_binning(camera, params, state, config,
                               active_sh_degree=active_sh_degree,
                               inv_depth=inv_depth, capacity=capacity)

    @jax.jit
    def rend_f(camera, params, state, env, cam_rays, binning):
        return render(camera, params, state, config, env_map=env,
                      cam_rays=cam_rays, render_objmask=render_objmask,
                      active_sh_degree=active_sh_degree, inv_depth=inv_depth,
                      backend=backend, capacity=capacity,
                      max_per_tile=max_per_tile, chunk=chunk,
                      precomputed_binning=binning)

    def full(camera, params, state, env, cam_rays):
        return rend_f(camera, params, state, env, cam_rays,
                      bin_f(camera, params, state))

    return full


def render(
    camera: Camera,
    params: GaussianParams,
    state: GaussianState,
    config: GaussianConfig,
    env_map: Optional[EnvironmentMap] = None,
    cam_rays: Optional[jnp.ndarray] = None,  # [H,W,3] cached camera rays
    flow_time: Optional[jnp.ndarray] = None,
    render_objmask: bool = False,
    override_color: Optional[jnp.ndarray] = None,
    screen_offset: Optional[jnp.ndarray] = None,
    active_sh_degree: Optional[int] = None,
    inv_depth: bool = True,
    scaling_modifier: float = 1.0,
    backend: str = "auto",
    capacity: int = 1 << 18,
    max_per_tile: int = 2048,
    chunk: int = 32,
    precomputed_binning=None,
) -> dict[str, Any]:
    sh_degree = (active_sh_degree if active_sh_degree is not None
                 else config.sh_degree)
    settings = settings_for_camera(camera, sh_degree, inv_depth,
                                   scaling_modifier)

    flow_points = None
    if flow_time is not None:
        flow_points = deformed_xyz(params, config, flow_time)

    pkg = deformed_package(params, state, config, camera.time)
    semantic = None
    if render_objmask:
        semantic = obj_mask(params).astype(jnp.float32)[:, None]

    out = rasterize(
        means3d=pkg["xyz"],
        opacities=pkg["opacity"],
        scales=activated_scaling(params),
        rotations=pkg["rotation"],
        settings=settings,
        shs=pkg["shs"] if override_color is None else None,
        colors_precomp=override_color,
        flow_points=flow_points,
        semantic=semantic,
        screen_offset=screen_offset,
        active_mask=state.alive,
        backend=backend,
        capacity=capacity,
        max_per_tile=max_per_tile,
        chunk=chunk,
        precomputed_binning=precomputed_binning,
    )

    foreground = out.color
    if env_map is not None and cam_rays is not None:
        background = env_map.image_background(cam_rays, camera.world_view)
        rendered = foreground + (1.0 - out.opacity) * background
    else:
        background = jnp.zeros_like(foreground)
        rendered = foreground

    return {
        "render": rendered,
        "foreground": foreground,
        "background": background,
        "depth": out.depth[0],
        "img_opacity": out.opacity[0],
        "img_flow": out.flow,
        "img_semantic": out.semantic,
        "radii": out.radii,
        "visibility_filter": out.radii > 0,
        "opacity": pkg["opacity"],
        **pkg,
    }
