"""Range-image LiDAR geometry (numpy, offline).

The substantive math of the Waymo converter — spherical range images to
world-frame point clouds with rolling-shutter per-pixel poses — kept
SDK-free so it is testable here and reusable by any range-image dataset.
Semantics match the reference's vendored Waymo utilities
(scripts/waymo/waymo.py:85-305: beam inclinations, extrinsic-yaw-corrected
azimuth sweep, polar->cartesian, sensor->vehicle, pixel-pose->world->
frame-vehicle); only the protobuf/tfrecord decoding stays behind the SDK
in scripts/convert_waymo.py.

Conventions (Waymo Open Dataset):
  - range image rows sweep inclination TOP-DOWN (row 0 = max beam angle);
  - columns sweep azimuth from +pi (col 0) to -pi, centered on pixel
    middles and corrected by the sensor's extrinsic yaw;
  - vehicle frame: x forward, y left, z up; cameras use an OpenCV frame
    (x right, y down, z forward) via the OPENCV2DATASET flip.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# OpenCV camera axes expressed in the dataset/vehicle frame
# (scripts/waymo/waymo.py:323)
OPENCV2DATASET = np.array(
    [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
    dtype=np.float64)


def beam_inclinations(incl_min: float, incl_max: float,
                      height: int) -> np.ndarray:
    """[H] uniform beam inclinations, row 0 = TOP beam (max angle).

    Pixel-centered interpolation over [min, max], then reversed into range
    image row order (waymo.py:131-139)."""
    up = (0.5 + np.arange(height)) / height * (incl_max - incl_min) + incl_min
    return up[::-1].copy()


def azimuths(width: int, extrinsic: np.ndarray) -> np.ndarray:
    """[W] pixel-centered azimuth sweep +pi -> -pi, yaw-corrected so column
    angles are measured in the VEHICLE frame's x-y plane."""
    az_correction = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (np.arange(width, 0, -1) - 0.5) / width
    return (ratios * 2.0 - 1.0) * np.pi - az_correction


def range_image_to_points(
    range_image: np.ndarray,            # [H, W] ranges (<=0 -> no return)
    extrinsic: np.ndarray,              # [4, 4] sensor -> vehicle
    inclinations: Optional[np.ndarray] = None,   # [H]; else from min/max
    incl_min: Optional[float] = None,
    incl_max: Optional[float] = None,
    pixel_pose: Optional[np.ndarray] = None,     # [H, W, 4, 4] pixel->world
    frame_pose: Optional[np.ndarray] = None,     # [4, 4] vehicle->world
) -> np.ndarray:
    """[N, 3] vehicle-frame points for every pixel with range > 0.

    Mirrors extract_point_cloud_from_range_image (waymo.py:170-305): polar
    coordinates from the beam table and the azimuth sweep, cartesian in the
    SENSOR frame, rotated into the vehicle frame by the extrinsic; when the
    rolling-shutter per-pixel poses are given (TOP lidar), each point is
    carried pixel-pose -> world -> back into the frame_pose vehicle frame.
    """
    H, W = range_image.shape
    if inclinations is None:
        inclinations = beam_inclinations(incl_min, incl_max, H)
    az = azimuths(W, extrinsic)

    cos_az = np.cos(az)[None, :]
    sin_az = np.sin(az)[None, :]
    cos_in = np.cos(inclinations)[:, None]
    sin_in = np.sin(inclinations)[:, None]
    r = range_image.astype(np.float64)

    x = cos_az * cos_in * r
    y = sin_az * cos_in * r
    z = sin_in * r
    pts = np.stack([x, y, z], axis=-1)                    # [H, W, 3] sensor

    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    pts = pts @ R.T + t                                   # vehicle frame

    if pixel_pose is not None:
        if frame_pose is None:
            raise ValueError("frame_pose must be set with pixel_pose")
        rot = pixel_pose[..., :3, :3]                     # [H, W, 3, 3]
        tr = pixel_pose[..., :3, 3]
        pts = np.einsum("hwij,hwj->hwi", rot, pts) + tr   # world
        w2v = np.linalg.inv(frame_pose)
        pts = pts @ w2v[:3, :3].T + w2v[:3, 3]            # frame vehicle

    mask = range_image > 0
    return pts[mask].astype(np.float32)


def pixel_pose_matrices(rpy_xyz: np.ndarray) -> np.ndarray:
    """[H, W, 6] (roll, pitch, yaw, x, y, z) -> [H, W, 4, 4] transforms
    (the TOP lidar's per-pixel pose channel layout, waymo.py:116-128)."""
    roll, pitch, yaw = (rpy_xyz[..., 0], rpy_xyz[..., 1], rpy_xyz[..., 2])
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    H, W = roll.shape
    out = np.zeros((H, W, 4, 4), dtype=np.float64)
    # R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    out[..., 0, 0] = cy * cp
    out[..., 0, 1] = cy * sp * sr - sy * cr
    out[..., 0, 2] = cy * sp * cr + sy * sr
    out[..., 1, 0] = sy * cp
    out[..., 1, 1] = sy * sp * sr + cy * cr
    out[..., 1, 2] = sy * sp * cr - cy * sr
    out[..., 2, 0] = -sp
    out[..., 2, 1] = cp * sr
    out[..., 2, 2] = cp * cr
    out[..., :3, 3] = rpy_xyz[..., 3:6]
    out[..., 3, 3] = 1.0
    return out


def camera_world_to_cam(ego_to_world: np.ndarray,
                        cam_extrinsic: np.ndarray) -> np.ndarray:
    """[4, 4] world -> OpenCV-camera matrix (waymo.py:399-400): the camera
    sits at ego_to_world @ extrinsic with dataset axes; flip to OpenCV and
    invert."""
    rt_inv = ego_to_world @ cam_extrinsic @ OPENCV2DATASET
    return np.linalg.inv(rt_inv)


def project_points(points: np.ndarray, K: np.ndarray, RT: np.ndarray,
                   width: int, height: int):
    """([N, 2] pixel uv, [N] depth, [N] in-image mask) — waymo.py:405-411
    (z > 0 and uv within [0, W-1] x [0, H-1])."""
    cam = points @ RT[:3, :3].T + RT[:3, 3]
    depth = cam[:, 2]
    uvw = cam @ K.T
    uv = uvw[:, :2] / np.maximum(uvw[:, 2:], 1e-9)
    mask = ((depth > 0.0)
            & (uv[:, 0] >= 0.0) & (uv[:, 0] <= width - 1)
            & (uv[:, 1] >= 0.0) & (uv[:, 1] <= height - 1))
    return uv, depth, mask


def sample_colors_aligned(image: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """[N, 3] bilinear colors with torch grid_sample(align_corners=True)
    parity for coordinates normalized by u/W*2-1 (waymo.py:424-430): the
    effective sample location is uv * (size-1) / size."""
    H, W = image.shape[:2]
    x = np.clip(uv[:, 0] * (W - 1) / W, 0, W - 1)
    y = np.clip(uv[:, 1] * (H - 1) / H, 0, H - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    top = image[y0, x0] * (1 - wx) + image[y0, x1] * wx
    bot = image[y1, x0] * (1 - wx) + image[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def lidar_depth_map(uv: np.ndarray, depth: np.ndarray, mask: np.ndarray,
                    width: int, height: int):
    """([H, W] sparse depth, [H, W] validity) — waymo.py:412-419 (nearest
    pixel rounding; later writes win ties, matching the reference order)."""
    depth_map = np.zeros((height, width), dtype=np.float32)
    depth_mask = np.zeros((height, width), dtype=bool)
    ij = np.round(uv[mask]).astype(np.int32)
    depth_map[ij[:, 1], ij[:, 0]] = depth[mask]
    depth_mask[ij[:, 1], ij[:, 0]] = True
    return depth_map, depth_mask


def get_val_frames(num_frames: int, test_every: Optional[int] = None,
                   train_every: Optional[int] = None) -> set:
    """StreetGS split protocol (waymo.py:34-42)."""
    if train_every is None:
        return set(np.arange(test_every, num_frames, test_every).tolist())
    train = set(np.arange(0, num_frames, train_every).tolist())
    return (set(range(num_frames)) - train) if train_every > 1 else train


# ---------------------------------------------------------------------------
# quaternion-pose helpers (nuScenes metadata; scripts/nuscene/nuscene.py)
# ---------------------------------------------------------------------------

def quat_to_rotation(q: np.ndarray) -> np.ndarray:
    """[4] wxyz (any norm) -> [3, 3] (nuscene.py:27-41 build_rotation)."""
    q = np.asarray(q, np.float64)
    r, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


def pose_rt(rotation_quat, translation) -> np.ndarray:
    """(wxyz quat, xyz) -> [4, 4] rigid transform."""
    m = np.eye(4)
    m[:3, :3] = quat_to_rotation(rotation_quat)
    m[:3, 3] = np.asarray(translation, np.float64)
    return m


def nearest_by_timestamp(timestamps: np.ndarray, query: float) -> int:
    """Index of the closest timestamp (the lidar<->camera frequency
    alignment, nuscene.py:13-25/144-145)."""
    i = int(np.argmin(np.abs(np.asarray(timestamps, np.float64) - query)))
    return i
