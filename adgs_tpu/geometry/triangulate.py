"""Known-pose multi-view triangulation (native COLMAP replacement).

The reference shells out to the COLMAP binary to produce its static SfM
cloud (scripts/colmap.py:105-186: feature_extractor + exhaustive_matcher +
point_triangulator with fixed known poses, masked by object+sky masks; the
result feeds `colmap-*.ply`, asserted to exist by data/readers.py). This
module is a self-contained replacement with the same contract:

  features   -> OpenCV SIFT restricted to the static mask
  matching   -> ratio-test descriptor matching over frame pairs
  tracks     -> union-find over matched keypoint observations
  geometry   -> batched multi-view DLT with the poses held FIXED (the
                dataset gives exact per-frame extrinsics, so there is no
                bundle adjustment — matching --Mapper.ba_refine_* 0)
  filtering  -> reprojection error / triangulation angle / cheirality,
                mirroring the reference's triangulator flags
                (--Mapper.filter_max_reproj_error 4,
                 --Mapper.filter_min_tri_angle 0.5)

Everything here is offline host code (numpy + cv2) by design — it runs once
per scene during dataset preparation, not in the training loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np


class Observations(NamedTuple):
    """Flat keypoint observations across all frames."""
    xy: np.ndarray        # [O, 2] pixel coordinates
    frame: np.ndarray     # [O] frame index per observation
    offset: np.ndarray    # [F+1] obs id range per frame (kp k of frame f
    #                       has obs id offset[f] + k)
    color: np.ndarray     # [O, 3] sampled image color (uint8)


class Tracks(NamedTuple):
    track_of: np.ndarray  # [O] track id per observation (-1: unmatched)
    n_tracks: int


def detect_features(image: np.ndarray, mask: Optional[np.ndarray] = None,
                    max_features: int = 8192):
    """SIFT keypoints + descriptors inside the static-region mask.

    image: [H, W, 3] uint8 (or [H, W] gray); mask: [H, W] bool, True where
    features are allowed (reference: object mask == 0 AND sky mask == 0,
    scripts/colmap.py:208-214)."""
    import cv2
    gray = (cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
            if image.ndim == 3 else image)
    m8 = None if mask is None else (mask.astype(np.uint8) * 255)
    sift = cv2.SIFT_create(nfeatures=max_features)
    kps, desc = sift.detectAndCompute(gray, m8)
    if not kps:
        return np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32)
    xy = np.asarray([kp.pt for kp in kps], dtype=np.float32)
    return xy, desc.astype(np.float32)


def match_descriptors(desc_a: np.ndarray, desc_b: np.ndarray,
                      ratio: float = 0.8) -> np.ndarray:
    """Lowe-ratio matches [M, 2] (indices into a / b), mutual-best."""
    import cv2
    if len(desc_a) == 0 or len(desc_b) == 0:
        return np.zeros((0, 2), np.int64)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    pairs = bf.knnMatch(desc_a, desc_b, k=2)
    out = []
    for cand in pairs:
        if len(cand) == 2 and cand[0].distance < ratio * cand[1].distance:
            out.append((cand[0].queryIdx, cand[0].trainIdx))
        elif len(cand) == 1:
            out.append((cand[0].queryIdx, cand[0].trainIdx))
    if not out:
        return np.zeros((0, 2), np.int64)
    m = np.asarray(out, dtype=np.int64)
    # enforce one-to-one on the b side (keep first/best occurrence)
    _, first = np.unique(m[:, 1], return_index=True)
    return m[np.sort(first)]


def build_tracks(offset: np.ndarray,
                 pair_matches: Sequence[tuple[int, int, np.ndarray]]
                 ) -> Tracks:
    """Union-find merge of pairwise matches into multi-view tracks.

    pair_matches: iterable of (frame_a, frame_b, [M, 2] kp-index matches).
    Observations that never match stay track -1; merged components are
    renumbered 0..n_tracks-1. Components with two observations in the SAME
    frame are inconsistent (a colmap two-view-track analog of a bad merge)
    and are dropped wholesale."""
    n_obs = int(offset[-1])
    parent = np.arange(n_obs, dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:       # path compression
            parent[i], i = root, parent[i]
        return root

    matched = np.zeros(n_obs, dtype=bool)
    for fa, fb, m in pair_matches:
        if len(m) == 0:
            continue
        ia = offset[fa] + m[:, 0]
        ib = offset[fb] + m[:, 1]
        matched[ia] = True
        matched[ib] = True
        for a, b in zip(ia, ib):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra

    roots = np.fromiter((find(i) for i in range(n_obs)), np.int64, n_obs)
    roots = np.where(matched, roots, -1)

    # drop components observing the same frame twice
    frame_of = np.searchsorted(offset, np.arange(n_obs), side="right") - 1
    ok = roots >= 0
    key = roots[ok] * (frame_of.max() + 2) + frame_of[ok]
    _, counts = np.unique(key, return_counts=True)
    if np.any(counts > 1):
        uniq, inv = np.unique(key, return_inverse=True)
        bad_keys = uniq[counts > 1]
        bad_roots = np.unique(bad_keys // (frame_of.max() + 2))
        roots[np.isin(roots, bad_roots)] = -1
        ok = roots >= 0

    uniq_roots, track = np.unique(roots[ok], return_inverse=True)
    track_of = np.full(n_obs, -1, dtype=np.int64)
    track_of[ok] = track
    return Tracks(track_of=track_of, n_tracks=len(uniq_roots))


def triangulate_tracks(obs: Observations, tracks: Tracks,
                       proj: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched DLT over all tracks at once.

    proj: [F, 3, 4] fixed projection matrices K @ [R | T]. Each observation
    contributes rows (x * P2 - P0, y * P2 - P1); the per-track 4x4 normal
    matrices are accumulated with scatter-adds and solved together by one
    batched eigendecomposition (smallest eigenvector = homogeneous point).
    Returns (xyz [M, 3], valid [M] — tracks with >= 2 observations and a
    well-conditioned homogeneous solution)."""
    sel = tracks.track_of >= 0
    t_id = tracks.track_of[sel]
    P = proj[obs.frame[sel]]                       # [S, 3, 4]
    xy = obs.xy[sel]
    r0 = xy[:, 0:1] * P[:, 2, :] - P[:, 0, :]      # [S, 4]
    r1 = xy[:, 1:2] * P[:, 2, :] - P[:, 1, :]
    # accumulate A^T A per track
    M = tracks.n_tracks
    ata = np.zeros((M, 4, 4), np.float64)
    np.add.at(ata, t_id, r0[:, :, None] * r0[:, None, :])
    np.add.at(ata, t_id, r1[:, :, None] * r1[:, None, :])
    n_obs_per = np.bincount(t_id, minlength=M)

    # normalize rows for conditioning, then batched symmetric eigensolve
    scale = np.maximum(np.sqrt(np.trace(ata, axis1=1, axis2=2)), 1e-12)
    w, v = np.linalg.eigh(ata / scale[:, None, None])
    h = v[:, :, 0]                                 # smallest eigenvector
    valid = (np.abs(h[:, 3]) > 1e-10) & (n_obs_per >= 2)
    xyz = h[:, :3] / np.where(valid, h[:, 3], 1.0)[:, None]
    return xyz.astype(np.float64), valid


def filter_tracks(xyz: np.ndarray, valid: np.ndarray, obs: Observations,
                  tracks: Tracks, proj: np.ndarray,
                  R: np.ndarray, T: np.ndarray,
                  max_reproj_err: float = 4.0,
                  min_tri_angle_deg: float = 0.5) -> np.ndarray:
    """COLMAP-flag-equivalent filters (scripts/colmap.py:170-180):
    max reprojection error over the track's observations, cheirality
    (positive depth in every view), and minimum triangulation angle
    (max angular spread of the viewing rays, measured against the first
    ray of each track). Returns a keep mask over tracks."""
    sel = tracks.track_of >= 0
    t_id = tracks.track_of[sel]
    frames = obs.frame[sel]
    xy = obs.xy[sel]
    M = tracks.n_tracks

    X = xyz[t_id]                                   # [S, 3]
    Ph = proj[frames]                               # [S, 3, 4]
    Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    uvw = np.einsum("sij,sj->si", Ph, Xh)
    depth_ok = uvw[:, 2] > 1e-9
    uv = uvw[:, :2] / np.where(depth_ok, uvw[:, 2], 1.0)[:, None]
    err = np.linalg.norm(uv - xy, axis=1)

    max_err = np.zeros(M)
    np.maximum.at(max_err, t_id, np.where(depth_ok, err, np.inf))

    # camera-to-point unit rays in world coordinates
    centers = -np.einsum("fij,fj->fi", R.transpose(0, 2, 1), T)   # [F, 3]
    rays = X - centers[frames]
    rays /= np.maximum(np.linalg.norm(rays, axis=1, keepdims=True), 1e-12)
    # angular spread proxy: max angle to the track's FIRST observed ray
    first_ray = np.zeros((M, 3))
    seen = np.zeros(M, dtype=bool)
    order = np.argsort(t_id, kind="stable")
    to, ro = t_id[order], rays[order]
    firsts = np.concatenate([[True], to[1:] != to[:-1]])
    first_ray[to[firsts]] = ro[firsts]
    seen[to[firsts]] = True
    cosang = np.einsum("si,si->s", rays, first_ray[t_id])
    min_cos = np.ones(M)
    np.minimum.at(min_cos, t_id, cosang)
    tri_angle = np.degrees(np.arccos(np.clip(min_cos, -1.0, 1.0)))

    cheir_ok = np.ones(M, dtype=bool)
    np.logical_and.at(cheir_ok, t_id, depth_ok)
    return (valid & seen & cheir_ok
            & (max_err <= max_reproj_err)
            & (tri_angle >= min_tri_angle_deg))


def sequential_pairs(frames: Sequence[int], cam_of: Sequence[int],
                     window: int = 0) -> list[tuple[int, int]]:
    """Frame pairs to match. window=0 -> exhaustive (the reference's
    exhaustive_matcher); window>0 -> same-camera temporal neighbours within
    `window` plus all cross-camera pairs at equal time step (cheaper on
    long sequences, same track topology for forward-moving rigs)."""
    n = len(frames)
    if window <= 0:
        return [(i, j) for i in range(n) for j in range(i + 1, n)]
    pairs = []
    step_of = {}
    for i in range(n):
        step_of.setdefault(cam_of[i], []).append(i)
    for cam_frames in step_of.values():
        for a in range(len(cam_frames)):
            for b in range(a + 1, min(a + 1 + window, len(cam_frames))):
                pairs.append((cam_frames[a], cam_frames[b]))
    # cross-camera, same temporal step
    by_step: dict = {}
    for i in range(n):
        by_step.setdefault(frames[i], []).append(i)
    for group in by_step.values():
        for a in range(len(group)):
            for b in range(a + 1, len(group)):
                pairs.append((group[a], group[b]))
    return sorted(set(pairs))


def triangulate_known_poses(images: Sequence[np.ndarray],
                            masks: Sequence[Optional[np.ndarray]],
                            K: np.ndarray, R: np.ndarray, T: np.ndarray,
                            frame_steps: Optional[Sequence[int]] = None,
                            cam_of: Optional[Sequence[int]] = None,
                            window: int = 0,
                            max_features: int = 8192,
                            ratio: float = 0.8,
                            max_reproj_err: float = 4.0,
                            min_tri_angle_deg: float = 0.5,
                            verbose: bool = False):
    """Full pipeline: SIFT -> match -> tracks -> DLT -> filters.

    K: [F, 3, 3] or [3, 3]; R/T: [F, 3, 3] / [F, 3] world-to-camera.
    Returns (xyz [M, 3], rgb [M, 3] uint8) of surviving tracks."""
    F = len(images)
    K = np.broadcast_to(np.asarray(K, np.float64),
                        (F, 3, 3)) if np.asarray(K).ndim != 3 else np.asarray(K, np.float64)
    R = np.asarray(R, np.float64)
    T = np.asarray(T, np.float64)
    proj = K @ np.concatenate([R, T[:, :, None]], axis=2)     # [F, 3, 4]

    feats, descs, colors = [], [], []
    for img, m in zip(images, masks):
        xy, d = detect_features(img, m, max_features=max_features)
        feats.append(xy)
        descs.append(d)
        if img.ndim == 3:
            ix = np.clip(xy.astype(int), 0, [img.shape[1] - 1,
                                             img.shape[0] - 1])
            colors.append(img[ix[:, 1], ix[:, 0]])
        else:
            colors.append(np.full((len(xy), 3), 128, np.uint8))
    offset = np.concatenate([[0], np.cumsum([len(f) for f in feats])])
    obs = Observations(
        xy=np.concatenate(feats) if feats else np.zeros((0, 2), np.float32),
        frame=np.repeat(np.arange(F), [len(f) for f in feats]),
        offset=offset.astype(np.int64),
        color=np.concatenate(colors) if colors else np.zeros((0, 3), np.uint8))

    steps = list(frame_steps) if frame_steps is not None else list(range(F))
    cams = list(cam_of) if cam_of is not None else [0] * F
    pairs = sequential_pairs(steps, cams, window=window)
    pair_matches = []
    for a, b in pairs:
        m = match_descriptors(descs[a], descs[b], ratio=ratio)
        if len(m):
            pair_matches.append((a, b, m))
    if verbose:
        n_m = sum(len(m) for _, _, m in pair_matches)
        print(f"[triangulate] {F} frames, {offset[-1]} keypoints, "
              f"{len(pairs)} pairs, {n_m} matches")

    tracks = build_tracks(obs.offset, pair_matches)
    if tracks.n_tracks == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.uint8)
    xyz, valid = triangulate_tracks(obs, tracks, proj)
    keep = filter_tracks(xyz, valid, obs, tracks, proj, R, T,
                         max_reproj_err=max_reproj_err,
                         min_tri_angle_deg=min_tri_angle_deg)
    if verbose:
        print(f"[triangulate] {tracks.n_tracks} tracks -> "
              f"{int(keep.sum())} kept")

    # track color: first observation's pixel color
    sel = tracks.track_of >= 0
    t_id = tracks.track_of[sel]
    order = np.argsort(t_id, kind="stable")
    firsts = np.concatenate([[True], t_id[order][1:] != t_id[order][:-1]])
    rgb = np.zeros((tracks.n_tracks, 3), np.uint8)
    rgb[t_id[order][firsts]] = obs.color[sel][order][firsts]
    return xyz[keep], rgb[keep]
