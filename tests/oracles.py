"""NumPy oracles transcribing the reference semantics for parity tests.

These are slow, scalar-faithful implementations used ONLY as ground truth.
They follow the CUDA code paths (glm column-major semantics resolved to
plain math) so the production JAX/Pallas code is tested against an
independent executable spec, not against itself.
"""

from __future__ import annotations

import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396]
SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435]


def rotmat_from_quat(q):
    """Standard wxyz rotation matrix (utils/general_utils.py:79-97)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q)
    r, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


def cov3d_oracle(scale, quat, mod=1.0):
    """forward.cu:118-152 -> 6-vector upper triangle of R^T S^2 R."""
    R = rotmat_from_quat(quat)
    M = np.diag(mod * np.asarray(scale, dtype=np.float64)) @ R
    S = M.T @ M
    return np.array([S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2]])


def cov2d_oracle(mean_world, cov3d6, world_view_T, focal_x, focal_y,
                 tan_fovx, tan_fovy):
    """forward.cu:74-113. world_view_T is the stored (transposed) 4x4."""
    WV = np.asarray(world_view_T, dtype=np.float64).T  # math convention
    t = WV[:3, :3] @ mean_world + WV[:3, 3]
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = np.clip(t[0] / t[2], -limx, limx) * t[2]
    ty = np.clip(t[1] / t[2], -limy, limy) * t[2]
    tz = t[2]

    J = np.array([
        [focal_x / tz, 0.0, -(focal_x * tx) / (tz * tz)],
        [0.0, focal_y / tz, -(focal_y * ty) / (tz * tz)],
    ])
    W = WV[:3, :3]
    s = cov3d6
    Sigma = np.array([
        [s[0], s[1], s[2]],
        [s[1], s[3], s[4]],
        [s[2], s[4], s[5]],
    ])
    cov = J @ W @ Sigma @ W.T @ J.T
    cov[0, 0] += 0.3
    cov[1, 1] += 0.3
    return np.array([cov[0, 0], cov[0, 1], cov[1, 1]])


def sh_oracle(deg, sh, dirs):
    """utils/sh_utils.py:60-110 for channel-last [K, C] coeffs, [3] dir."""
    result = SH_C0 * sh[0]
    if deg > 0:
        x, y, z = dirs
        result = result - SH_C1 * y * sh[1] + SH_C1 * z * sh[2] - SH_C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + SH_C2[0] * xy * sh[4] + SH_C2[1] * yz * sh[5]
                      + SH_C2[2] * (2 * zz - xx - yy) * sh[6]
                      + SH_C2[3] * xz * sh[7] + SH_C2[4] * (xx - yy) * sh[8])
            if deg > 2:
                result = (result
                          + SH_C3[0] * y * (3 * xx - yy) * sh[9]
                          + SH_C3[1] * xy * z * sh[10]
                          + SH_C3[2] * y * (4 * zz - xx - yy) * sh[11]
                          + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                          + SH_C3[4] * x * (4 * zz - xx - yy) * sh[13]
                          + SH_C3[5] * z * (xx - yy) * sh[14]
                          + SH_C3[6] * x * (xx - 3 * yy) * sh[15])
    return result


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def unitquat_to_rotvec(q):
    """roma semantics (shortest arc): flip to w>=0 then axis*angle."""
    q = np.asarray(q, dtype=np.float64)
    if q[0] < 0:
        q = -q
    w = q[0]
    v = q[1:]
    vn = np.linalg.norm(v)
    if vn < 1e-14:
        return 2.0 * v
    angle = 2.0 * np.arctan2(vn, w)
    return v / vn * angle


def rotvec_to_unitquat(rv):
    rv = np.asarray(rv, dtype=np.float64)
    angle = np.linalg.norm(rv)
    if angle < 1e-14:
        return np.array([1.0, rv[0] / 2, rv[1] / 2, rv[2] / 2])
    axis = rv / angle
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def deboor_mat_oracle(order):
    """utils/func_utils.py:33-50 verbatim recursion."""
    if order == 0:
        return np.array([[1.0]])
    prior = deboor_mat_oracle(order - 1)
    prior_left = np.concatenate([prior, np.zeros((1, prior.shape[1]))], axis=0)
    prior_right = np.concatenate([np.zeros((1, prior.shape[1])), prior], axis=0)
    idx = np.arange(order)
    teo_left = np.zeros((order, order + 1))
    teo_left[idx, idx] = idx + 1
    teo_left[idx, idx + 1] = order - idx - 1
    teo_right = np.zeros((order, order + 1))
    teo_right[idx, idx] = -1
    teo_right[idx, idx + 1] = 1
    return (prior_left @ teo_left + prior_right @ teo_right) / order


def func_result_oracle(v, param, args):
    """get_func_result (utils/func_utils.py:121-173) in numpy, wxyz quats.

    param: [N, D, C]; args: 6-tuple. Returns [N, D] (or [N,4] when the quat
    block is active and D == 4).
    """
    param = np.asarray(param, dtype=np.float64)
    result = np.zeros(param.shape[:-1])
    offset = 0
    bspline_ctrl, bspline_order, poly_order, fft_order, quat_ctrl, quat_order = args
    if bspline_ctrl != 0:
        interval = bspline_ctrl - bspline_order
        start = min(int(v * interval), interval - 1)
        pts = param[..., start + offset: start + bspline_order + offset + 1]
        u = v * interval - start
        basis = (u ** np.arange(bspline_order + 1)) @ deboor_mat_oracle(bspline_order)
        result = result + np.sum(pts * basis, axis=-1)
        offset += bspline_ctrl
    if poly_order != 0:
        p = param[..., offset: offset + poly_order]
        basis = v ** np.arange(1, poly_order + 1)
        result = result + np.sum(p * basis, axis=-1)
        offset += poly_order
    if fft_order != 0:
        p = param[..., offset: offset + 2 * fft_order]
        freq = np.arange(1, fft_order + 1) * np.pi
        basis = np.concatenate([np.sin(v * freq), np.cos(v * freq)])
        result = result + np.sum(p * basis, axis=-1)
        offset += 2 * fft_order
    if quat_ctrl != 0:
        interval = quat_ctrl - quat_order
        start = min(int(v * interval), interval - 1)
        ctrl = param[..., start + offset: start + quat_order + offset + 1].copy()
        ctrl[:, 0, :] += 1.0  # identity offset on w row
        ctrl = np.transpose(ctrl, (0, 2, 1))  # [N, k+1, 4] wxyz
        ctrl = ctrl / np.linalg.norm(ctrl, axis=-1, keepdims=True)
        u = v * interval - start
        basis = (u ** np.arange(quat_order + 1)) @ deboor_mat_oracle(quat_order)
        cum = np.cumsum(basis[::-1])[::-1][1:]
        out = np.zeros((param.shape[0], 4))
        for n in range(param.shape[0]):
            vec = out_n = ctrl[n, 0]
            for i in range(quat_order):
                conj = ctrl[n, i] * np.array([1.0, -1, -1, -1])
                delta = quat_mul(conj, ctrl[n, i + 1])
                rv = unitquat_to_rotvec(delta) * cum[i]
                out_n = quat_mul(out_n, rotvec_to_unitquat(rv))
            out[n] = out_n
        result = result + out
    return result
