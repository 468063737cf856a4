"""Object-aware dynamic Gaussian model as capacity-padded JAX pytrees.

Capability parity with scene/gaussian_model.py (GaussianModel, 867 LoC):
separate static-scene / dynamic-object parameter blocks (:46-86), temporal
deformation getters (:173-231), time-gated opacity (:207-214), creation from
a point cloud (:255-335). The torch module's mutable tensors become two
frozen dataclasses:

  GaussianParams — trainable leaves (the 17 per-Gaussian optimizer groups of
                   training_setup :346-370, minus the env map which lives in
                   models/env_map.py)
  GaussianState  — non-trainable bookkeeping (alive masks, gs_time,
                   densification stats)

TPU design: the reference reallocates tensors on every densify/prune
(shape-changing, :560-823). Here each block is padded to a static CAPACITY
with an alive mask; clone/split/prune become masked scatters at fixed shape
(train/densify.py), and jit only retraces when capacity itself grows.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quaternion as quat
from ..core import splines
from ..core.sh import rgb_to_sh


class GaussianConfig(NamedTuple):
    """Static model configuration (hashable, jit-key)."""

    sh_degree: int
    xyz: splines.BasisConfig
    rotation: splines.BasisConfig
    shs: splines.BasisConfig
    background: splines.BasisConfig
    use_time_mask: bool = True

    @classmethod
    def from_order_args(cls, order_args: dict, frame_num: int,
                        downsample_ratio: int = 3, sh_degree: int = 3,
                        use_time_mask: bool = True) -> "GaussianConfig":
        """order_args: the 4-entry dict of arguments/__init__.py:71-77,
        defaults filled from the frame count (func_utils.py:82-119)."""
        return cls(
            sh_degree=sh_degree,
            xyz=splines.default_basis_config(order_args.get("xyz"), frame_num,
                                             downsample_ratio),
            rotation=splines.default_basis_config(order_args.get("rotation"),
                                                  frame_num, downsample_ratio),
            shs=splines.default_basis_config(order_args.get("shs"), frame_num,
                                             downsample_ratio),
            background=splines.default_basis_config(order_args.get("background"),
                                                    frame_num, downsample_ratio),
            use_time_mask=use_time_mask,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Trainable parameters. scene_* have capacity Ns, obj_* capacity No.
    Raw (pre-activation) storage matches the reference: log-scales,
    logit-opacities, unnormalized quaternions."""

    scene_xyz: jnp.ndarray        # [Ns,3]
    scene_shs_dc: jnp.ndarray     # [Ns,1,3]
    scene_shs_rest: jnp.ndarray   # [Ns,K-1,3]
    scene_scaling: jnp.ndarray    # [Ns,3]
    scene_rotation: jnp.ndarray   # [Ns,4]
    scene_opacity: jnp.ndarray    # [Ns,1]
    scene_shs_deform: jnp.ndarray  # [Ns,3,Cs]

    obj_xyz: jnp.ndarray          # [No,3]
    obj_shs_dc: jnp.ndarray       # [No,1,3]
    obj_shs_rest: jnp.ndarray     # [No,K-1,3]
    obj_scaling: jnp.ndarray      # [No,3]
    obj_rotation: jnp.ndarray     # [No,4]
    obj_opacity: jnp.ndarray      # [No,1]
    obj_shs_deform: jnp.ndarray   # [No,3,Cs]
    xyz_deform: jnp.ndarray       # [No,3,Cx]
    rotation_deform: jnp.ndarray  # [No,4,Cr]
    gs_time_sigma: jnp.ndarray    # [No,2] log-sigmas

    background_deform: jnp.ndarray  # [1,3,Cb]

    @property
    def scene_capacity(self) -> int:
        return self.scene_xyz.shape[0]

    @property
    def obj_capacity(self) -> int:
        return self.obj_xyz.shape[0]

    @property
    def capacity(self) -> int:
        return self.scene_capacity + self.obj_capacity


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianState:
    """Non-trainable per-Gaussian bookkeeping."""

    scene_alive: jnp.ndarray      # [Ns] bool
    obj_alive: jnp.ndarray        # [No] bool
    gs_time: jnp.ndarray          # [No] birth time of object Gaussians
    max_radii2d: jnp.ndarray      # [Ns+No] float
    xyz_grad_accum: jnp.ndarray   # [Ns+No] float
    denom: jnp.ndarray            # [Ns+No] float
    obj_near_idx: jnp.ndarray     # [A,Knn] int32 KNN groups (reg losses)
    obj_near_valid: jnp.ndarray   # [A] bool — False for padded anchor groups

    @property
    def alive(self) -> jnp.ndarray:
        return jnp.concatenate([self.scene_alive, self.obj_alive], axis=0)

    @property
    def num_scene(self) -> jnp.ndarray:
        return jnp.sum(self.scene_alive)

    @property
    def num_obj(self) -> jnp.ndarray:
        return jnp.sum(self.obj_alive)


class GaussianModel(NamedTuple):
    params: GaussianParams
    state: GaussianState
    config: GaussianConfig


def _pad(a: np.ndarray, cap: int, fill: float = 0.0) -> np.ndarray:
    out = np.full((cap,) + a.shape[1:], fill, dtype=np.float32)
    out[: a.shape[0]] = a
    return out


def round_capacity(n: int, quantum: int = 4096) -> int:
    return max(quantum, -(-n // quantum) * quantum)


def create_from_pcd(
    points: np.ndarray,          # [N,3]
    colors: np.ndarray,          # [N,3] in [0,1]
    obj_id: np.ndarray,          # [N] or [N,1]; >0.5 = object Gaussian
    times: np.ndarray,           # [N] birth times
    config: GaussianConfig,
    knn_mean_sq_dist: np.ndarray,  # [N] from ops.knn (simple-knn equivalent)
    capacity_quantum: int = 4096,
    seed: int = 0,
) -> tuple[GaussianParams, GaussianState]:
    """Initialize from a fused point cloud (scene/gaussian_model.py:255-335).

    Init rules replicated: SH DC from RGB2SH(colors), rest zero; log-scale =
    log(sqrt(clamped 3-NN mean sq dist)) isotropic; identity rotations;
    opacity logit(0.1); deformation params U(-1,1)*1e-5; gs_time_sigma =
    log(frame_gap) — the caller bakes frame_gap into `times`' scale and
    passes it via init_time_sigma below.
    """
    rng = np.random.default_rng(seed)
    obj_mask = np.asarray(obj_id).reshape(-1) > 0.5
    scene_mask = ~obj_mask
    K = (config.sh_degree + 1) ** 2

    shs_dc = np.asarray(rgb_to_sh(colors.astype(np.float32)))[:, None, :]
    shs_rest = np.zeros((points.shape[0], K - 1, 3), dtype=np.float32)
    dist2 = np.maximum(knn_mean_sq_dist, 1e-7)
    log_scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)
    rots = np.zeros((points.shape[0], 4), dtype=np.float32)
    rots[:, 0] = 1.0
    opac = np.full((points.shape[0], 1), np.log(0.1 / 0.9), dtype=np.float32)

    ns, no = int(scene_mask.sum()), int(obj_mask.sum())
    Ns = round_capacity(ns, capacity_quantum)
    No = round_capacity(no, capacity_quantum)

    def u(shape):
        return ((rng.random(shape, dtype=np.float32) * 2.0 - 1.0) * 1e-5)

    params = GaussianParams(
        scene_xyz=jnp.asarray(_pad(points[scene_mask].astype(np.float32), Ns)),
        scene_shs_dc=jnp.asarray(_pad(shs_dc[scene_mask], Ns)),
        scene_shs_rest=jnp.asarray(_pad(shs_rest[scene_mask], Ns)),
        scene_scaling=jnp.asarray(_pad(log_scales[scene_mask], Ns, fill=-10.0)),
        scene_rotation=jnp.asarray(_pad(rots[scene_mask], Ns)),
        scene_opacity=jnp.asarray(_pad(opac[scene_mask], Ns, fill=-15.0)),
        scene_shs_deform=jnp.asarray(_pad(u((ns, 3, config.shs.param_count)), Ns)),
        obj_xyz=jnp.asarray(_pad(points[obj_mask].astype(np.float32), No)),
        obj_shs_dc=jnp.asarray(_pad(shs_dc[obj_mask], No)),
        obj_shs_rest=jnp.asarray(_pad(shs_rest[obj_mask], No)),
        obj_scaling=jnp.asarray(_pad(log_scales[obj_mask], No, fill=-10.0)),
        obj_rotation=jnp.asarray(_pad(rots[obj_mask], No)),
        obj_opacity=jnp.asarray(_pad(opac[obj_mask], No, fill=-15.0)),
        obj_shs_deform=jnp.asarray(_pad(u((no, 3, config.shs.param_count)), No)),
        xyz_deform=jnp.asarray(_pad(u((no, 3, config.xyz.param_count)), No)),
        rotation_deform=jnp.asarray(_pad(u((no, 4, config.rotation.param_count)), No)),
        gs_time_sigma=jnp.asarray(_pad(np.zeros((no, 2), np.float32), No)),
        background_deform=jnp.asarray(u((1, 3, config.background.param_count))),
    )
    # dead rotation slots -> identity (avoid zero-norm quats)
    ident_fix = np.zeros((Ns, 4), np.float32)
    ident_fix[ns:, 0] = 1.0
    params = dataclasses.replace(
        params,
        scene_rotation=params.scene_rotation + jnp.asarray(ident_fix))
    ident_fix_o = np.zeros((No, 4), np.float32)
    ident_fix_o[no:, 0] = 1.0
    params = dataclasses.replace(
        params, obj_rotation=params.obj_rotation + jnp.asarray(ident_fix_o))

    scene_alive = np.zeros(Ns, dtype=bool)
    scene_alive[:ns] = True
    obj_alive = np.zeros(No, dtype=bool)
    obj_alive[:no] = True
    state = GaussianState(
        scene_alive=jnp.asarray(scene_alive),
        obj_alive=jnp.asarray(obj_alive),
        gs_time=jnp.asarray(_pad(np.asarray(times).reshape(-1)[obj_mask]
                                 .astype(np.float32), No)),
        max_radii2d=jnp.zeros(Ns + No, dtype=jnp.float32),
        xyz_grad_accum=jnp.zeros(Ns + No, dtype=jnp.float32),
        denom=jnp.zeros(Ns + No, dtype=jnp.float32),
        obj_near_idx=jnp.zeros((1, 1), dtype=jnp.int32),
        obj_near_valid=jnp.zeros((1,), dtype=bool),
    )
    return params, state


def set_init_time_sigma(params: GaussianParams, frame_gap: float) -> GaussianParams:
    """gs_time_sigma init = log(frame_gap) (gaussian_model.py:327)."""
    return dataclasses.replace(
        params,
        gs_time_sigma=jnp.full_like(params.gs_time_sigma, np.log(frame_gap)))


# ---------------------------------------------------------------------------
# Deformation evaluation (gaussian_model.py:173-231)
# ---------------------------------------------------------------------------

def deformed_xyz(params: GaussianParams, config: GaussianConfig,
                 t: jnp.ndarray) -> jnp.ndarray:
    """get_deformed_xyz (:173-185): per-object trajectory + global
    background trajectory on ALL Gaussians. Returns [Ns+No, 3]."""
    obj_xyz = params.obj_xyz
    if config.xyz.param_count > 0:
        obj_xyz = obj_xyz + splines.eval_trajectory(t, params.xyz_deform,
                                                    config.xyz)
    xyz = jnp.concatenate([params.scene_xyz, obj_xyz], axis=0)
    if config.background.param_count > 0:
        xyz = xyz + splines.eval_trajectory(t, params.background_deform,
                                            config.background)
    return xyz


def deformed_rotation(params: GaussianParams, config: GaussianConfig,
                      t: jnp.ndarray) -> jnp.ndarray:
    """get_deformed_rotation (:187-196). With a quaternion spline the spline
    output REPLACES the base rotation; otherwise the vector trajectory is
    added to it. Output normalized [Ns+No, 4]."""
    cfg = config.rotation
    if cfg.quat_ctrl != 0:
        obj_rot = splines.eval_quat_trajectory(t, params.rotation_deform, cfg)
        if cfg.bspline_ctrl or cfg.poly_order or cfg.fft_order:
            obj_rot = obj_rot + splines.eval_trajectory(t, params.rotation_deform, cfg)
    elif cfg.param_count > 0:
        obj_rot = params.obj_rotation + splines.eval_trajectory(
            t, params.rotation_deform, cfg)
    else:
        obj_rot = params.obj_rotation
    rotation = jnp.concatenate([params.scene_rotation, obj_rot], axis=0)
    return quat.normalize(rotation)


def deformed_shs(params: GaussianParams, config: GaussianConfig,
                 t: jnp.ndarray) -> jnp.ndarray:
    """get_deformed_shs (:198-205): Fourier color deformation on the DC term
    of ALL Gaussians. Returns [Ns+No, K, 3]."""
    shs_dc = jnp.concatenate([params.scene_shs_dc, params.obj_shs_dc], axis=0)
    if config.shs.param_count > 0:
        deform = jnp.concatenate([params.scene_shs_deform,
                                  params.obj_shs_deform], axis=0)
        shs_dc = shs_dc[:, 0] + splines.eval_trajectory(t, deform, config.shs)
        shs_dc = shs_dc[:, None]
    shs_rest = jnp.concatenate([params.scene_shs_rest, params.obj_shs_rest],
                               axis=0)
    return jnp.concatenate([shs_dc, shs_rest], axis=1)


def time_masked_opacity(params: GaussianParams, state: GaussianState,
                        t: jnp.ndarray) -> jnp.ndarray:
    """get_time_masked_opacity (:207-214): asymmetric Gaussian falloff around
    each object Gaussian's birth time. Returns [Ns+No, 1] activated."""
    delta = t - state.gs_time
    sigma = jnp.exp(params.gs_time_sigma)
    sigma = jnp.where(delta < 0.0, sigma[:, 0], sigma[:, 1])
    mask = jnp.exp(-0.5 * (delta / sigma) ** 2)
    obj_op = jax.nn.sigmoid(params.obj_opacity) * mask[:, None]
    scene_op = jax.nn.sigmoid(params.scene_opacity)
    return jnp.concatenate([scene_op, obj_op], axis=0)


def activated_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(jnp.concatenate(
        [params.scene_opacity, params.obj_opacity], axis=0))


def activated_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(jnp.concatenate(
        [params.scene_scaling, params.obj_scaling], axis=0))


def obj_mask(params: GaussianParams) -> jnp.ndarray:
    """get_obj_mask (:154-159): False for scene slots, True for object slots."""
    return jnp.concatenate([
        jnp.zeros(params.scene_capacity, dtype=bool),
        jnp.ones(params.obj_capacity, dtype=bool)])


def deformed_package(params: GaussianParams, state: GaussianState,
                     config: GaussianConfig, t: jnp.ndarray) -> dict:
    """get_deformed_pkg (:216-231): time-evaluated render inputs."""
    if config.use_time_mask:
        opacity = time_masked_opacity(params, state, t)
    else:
        opacity = activated_opacity(params)
    return {
        "xyz": deformed_xyz(params, config, t),
        "rotation": deformed_rotation(params, config, t),
        "shs": deformed_shs(params, config, t),
        "opacity": opacity,
    }
