"""Pseudo-label packagers: raw point tracks -> flow packages, mask/depth
importers (geometry/pseudo_labels.py) — the model-agnostic half of the
reference's neural generators (scripts/flow.py:379-624, scripts/semantic.py,
scripts/run-dpt.py). Verified against the actual consumers: data.readers
loads the written files, frames.flow_package converts entries, and the flow
loss evaluates finitely on them.
"""

import os

import numpy as np
import pytest

from adgs_tpu.geometry import pseudo_labels as pk

H, W = 32, 48
N_FRAMES = 6          # per camera
NUM_CAMS = 2
FOCAL = 40.0


def _K():
    return np.array([[FOCAL, 0, W / 2.0], [0, FOCAL, H / 2.0],
                     [0, 0, 1.0]], np.float32)


def _make_kitti_scene(root):
    """Minimal converted-KITTI metadata contract (poses.npz) that
    data/readers.py detect_dataset recognises."""
    os.makedirs(root, exist_ok=True)
    n = N_FRAMES * NUM_CAMS
    R = np.repeat(np.eye(3, dtype=np.float32)[None], n, axis=0)
    T = np.zeros((n, 3), np.float32)
    T[:, 0] = np.repeat(np.arange(N_FRAMES, dtype=np.float32), NUM_CAMS)
    times = np.repeat(np.linspace(0.0, 1.0, N_FRAMES), NUM_CAMS)
    np.savez(os.path.join(root, "poses.npz"), R=R, T=T, time_stamp=times,
             height=H, width=W, focal=FOCAL)
    return times


class TestTrackScatter:
    def test_identity_background_and_absolute_targets(self):
        q = np.array([[3.0, 5.0], [10.0, 2.0]], np.float32)
        tgt = np.array([[7.5, 6.0], [11.0, 2.5]], np.float32)
        vis = np.array([1.0, 0.5], np.float32)
        flow, v = pk.tracks_to_flow(H, W, q, tgt, vis)
        assert flow.shape == (2, H, W) and v.shape == (H, W)
        # untouched pixels: own coordinates, vis 0 (flow.py:443-452)
        assert flow[0, 0, 20] == 20 and flow[1, 9, 0] == 9
        assert v.sum() == pytest.approx(1.5)
        assert flow[0, 5, 3] == 7.5 and flow[1, 5, 3] == 6.0
        assert flow[0, 2, 10] == 11.0 and v[2, 10] == 0.5

    def test_out_of_bounds_queries_dropped(self):
        q = np.array([[-1.0, 5.0], [3.0, H + 2.0]], np.float32)
        flow, v = pk.tracks_to_flow(H, W, q, q + 1.0, np.ones(2))
        assert v.sum() == 0

    def test_queries_from_mask(self):
        m = np.zeros((H, W), np.float32)
        m[4, 7] = 1.0
        m[9, 1] = 0.4   # below the reference's 0.5 threshold
        q = pk.queries_from_mask(m)
        assert q.shape == (1, 2) and tuple(q[0]) == (7, 4)


class TestPackageSceneFlow:
    def _tracks_for(self, train_idx):
        """Constant +1px x-drift tracks for every train frame."""
        q = np.stack(np.meshgrid(np.arange(8, 12, dtype=np.float32),
                                 np.arange(6, 9, dtype=np.float32)),
                     axis=-1).reshape(-1, 2)
        tr = {}
        for g in train_idx:
            tr[int(g)] = dict(
                query=q,
                fwd=q + np.array([1.0, 0.0], np.float32),
                fwd_vis=np.ones(len(q), np.float32),
                bwd=q - np.array([1.0, 0.0], np.float32),
                bwd_vis=np.ones(len(q), np.float32))
        return tr

    def test_window_semantics_and_reader_roundtrip(self, tmp_path):
        root = str(tmp_path / "scene")
        times = _make_kitti_scene(root)
        # nvs-75 = test_every 4 -> per-cam val {4}; train per-cam 0,1,2,3,5
        is_val = pk._kitti_is_val(N_FRAMES * NUM_CAMS, NUM_CAMS, "nvs-75")
        train_idx = np.nonzero(~is_val)[0]
        assert len(train_idx) == 10
        written = pk.package_scene_flow(
            root, tracks=self._tracks_for(train_idx), slide_window=1,
            split_mode="nvs-75")
        assert len(written) == len(train_idx)
        stems = {os.path.basename(p) for p in written}
        assert stems == {f"{int(g):06d}.npz" for g in train_idx}

        pos_of = {int(g): p for p, g in enumerate(train_idx)}
        step = 1 * NUM_CAMS
        for p_file in written:
            gidx = int(os.path.basename(p_file)[:6])
            entries = list(np.load(p_file, allow_pickle=True)["flow"])
            p = pos_of[gidx]
            want = int(p // NUM_CAMS < len(train_idx) // NUM_CAMS - 1) \
                + int(p // NUM_CAMS >= 1)
            assert len(entries) == want, (gidx, p)
            # first entry of a non-terminal frame is the FORWARD package:
            # its time must equal the +window train frame's time
            if p // NUM_CAMS < len(train_idx) // NUM_CAMS - 1:
                tgt = int(train_idx[p + step])
                e = entries[0]
                assert float(e[0]) == pytest.approx(float(times[tgt]))
                assert np.asarray(e[1]).shape == (3, 3)
                fl = np.asarray(e[4])
                # tracked pixels carry ABSOLUTE +1px x targets
                assert fl[0, 7, 9] == pytest.approx(10.0)
                assert np.asarray(e[5])[7, 9] == 1.0

    def test_reader_and_loss_consume_packages(self, tmp_path):
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from adgs_tpu.data import frames as frames_lib
        from adgs_tpu.ops import flow as flow_lib

        root = str(tmp_path / "scene")
        _make_kitti_scene(root)
        is_val = pk._kitti_is_val(N_FRAMES * NUM_CAMS, NUM_CAMS, "nvs-75")
        train_idx = np.nonzero(~is_val)[0]
        written = pk.package_scene_flow(
            root, tracks=self._tracks_for(train_idx), slide_window=1,
            split_mode="nvs-75")
        raw = list(np.load(written[2], allow_pickle=True)["flow"])
        pkg = frames_lib.flow_package(raw[0])
        assert pkg.flow.shape == (2, H, W)
        img_flow = jnp.stack([jnp.zeros((H, W)), jnp.zeros((H, W)),
                              jnp.full((H, W), 5.0)]).astype(jnp.float32)
        loss = flow_lib.flow_loss(img_flow, pkg)
        assert np.isfinite(float(loss)) and float(loss) > 0.0


class TestImporters:
    def test_semantic_and_sky(self, tmp_path):
        root = str(tmp_path / "s")
        m = np.zeros((H, W), np.int64)
        m[2:5, 3:7] = 3
        w = pk.import_semantic_masks(root, {"000001": m})
        got = np.load(w[0])
        assert got.dtype == np.int32 and got[3, 4] == 3
        assert os.path.basename(w[0]) == "mask_000001.npy"
        w2 = pk.import_semantic_masks(root, {"000001": m > 0}, kind="sky")
        sky = np.load(w2[0])
        assert sky.dtype == np.uint8 and set(np.unique(sky)) <= {0, 1}

    def test_depth_normalized_hw1(self, tmp_path):
        root = str(tmp_path / "s")
        d = np.linspace(2.0, 9.0, H * W).reshape(H, W)
        w = pk.import_depth_maps(root, {"000000": d})
        got = np.load(w[0])
        assert got.shape == (H, W, 1)
        assert got.min() == pytest.approx(0.0)
        assert got.max() == pytest.approx(1.0)
