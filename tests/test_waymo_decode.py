"""Standalone Waymo decode path: TFRecord framing (CRC32C-verified),
protobuf wire codec, and the converter end-to-end over byte-faithful
segment fixtures — no tensorflow, no waymo SDK (data/tfrecord.py,
data/waymo_proto.py, scripts/convert_waymo.py load_frames fallback)."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from adgs_tpu.data import tfrecord, waymo_proto as wp

REPO = os.path.join(os.path.dirname(__file__), "..")


class TestTFRecordFraming:
    def test_roundtrip(self, tmp_path):
        recs = [b"hello", b"", os.urandom(1000)]
        p = str(tmp_path / "x.tfrecord")
        tfrecord.write_records(p, recs)
        assert list(tfrecord.read_records(p)) == recs

    def test_crc32c_known_vectors(self):
        # RFC 3720 appendix B.4 test vectors
        assert tfrecord.crc32c(b"") == 0
        assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
        assert tfrecord.crc32c(b"\xff" * 32) == 0x62A8AB43
        assert tfrecord.crc32c(bytes(range(32))) == 0x46DD794E

    def test_corruption_detected(self, tmp_path):
        p = str(tmp_path / "x.tfrecord")
        tfrecord.write_records(p, [b"payload-bytes"])
        raw = bytearray(open(p, "rb").read())
        raw[14] ^= 0xFF   # flip a payload byte
        open(p, "wb").write(bytes(raw))
        with pytest.raises(IOError, match="CRC"):
            list(tfrecord.read_records(p))


class TestWireCodec:
    def test_frame_roundtrip(self):
        rng = np.random.default_rng(0)
        pose = np.eye(4)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        ri = rng.uniform(1.0, 10.0, (4, 8, 2)).astype(np.float32)
        rp = rng.normal(size=(4, 8, 6)).astype(np.float32)
        buf = wp.encode_frame(
            pose=pose, timestamp_micros=123456789,
            camera_calibrations=[dict(
                name=1, intrinsic=np.arange(9, dtype=np.float64) + 0.5,
                extrinsic=np.eye(4), width=64, height=48)],
            laser_calibrations=[dict(
                name=wp.LASER_TOP,
                beam_inclinations=np.array([-0.3, -0.1, 0.1, 0.3]),
                beam_inclination_min=-0.3, beam_inclination_max=0.3,
                extrinsic=np.diag([1.0, 1.0, 1.0, 1.0]))],
            images=[dict(name=1, image=b"\xff\xd8jpegish")],
            lasers=[dict(name=wp.LASER_TOP, range_image=ri,
                         range_image_pose=rp)])
        fr = wp.decode_frame(buf)
        np.testing.assert_allclose(fr.pose, pose)
        assert fr.timestamp_micros == 123456789
        cc = fr.camera_calibrations[0]
        assert (cc.name, cc.width, cc.height) == (1, 64, 48)
        np.testing.assert_allclose(cc.intrinsic,
                                   np.arange(9, dtype=np.float64) + 0.5)
        lc = fr.laser_calibrations[0]
        np.testing.assert_allclose(lc.beam_inclinations,
                                   [-0.3, -0.1, 0.1, 0.3])
        assert lc.beam_inclination_min == pytest.approx(-0.3)
        assert fr.images[0].image == b"\xff\xd8jpegish"
        la = fr.lasers[0]
        np.testing.assert_allclose(la.range_image, ri, rtol=1e-6)
        np.testing.assert_allclose(la.range_image_pose, rp, rtol=1e-6)

    def test_packed_repeated_scalars_also_decode(self):
        # newer exporters emit packed numeric fields (wire type 2)
        import struct
        vals = [1.5, -2.25, 3.0]
        payload = b"".join(struct.pack("<d", v) for v in vals)
        buf = wp.enc_bytes(1, payload)   # field 1, packed doubles
        fields = wp.parse_message(buf)
        got = wp._repeated_scalar(fields[1], "d", 8)
        np.testing.assert_allclose(got, vals)

    def test_varint_boundaries(self):
        for v in (0, 1, 127, 128, 300, 2 ** 32, 2 ** 60):
            buf = wp.enc_varint(7, v)
            fields = wp.parse_message(buf)
            assert fields[7][0] == v


def make_waymo_segment(path, n_frames=8, W_img=64, H_img=48):
    """Byte-faithful synthetic segment: TOP lidar ring over a ground
    plane at z = 0 (lidar 2 m up), FRONT camera looking +x, ego driving
    +x at 1 m/frame."""
    from PIL import Image

    rng = np.random.default_rng(0)
    fx = fy = 40.0
    intr = np.array([fx, fy, W_img / 2, H_img / 2, 0, 0, 0, 0, 0],
                    np.float64)
    # waymo camera frame: +x forward, +y left, +z up; mounted 1.5 m up
    cam_ext = np.eye(4)
    cam_ext[2, 3] = 1.5
    # TOP lidar: 2 m up, 4 beams angled DOWN so rays hit the ground
    laser_ext = np.eye(4)
    laser_ext[2, 3] = 2.0
    incl = np.array([-0.5, -0.4, -0.3, -0.2])
    Hri, Wri = 4, 32

    buf = io.BytesIO()
    img = Image.fromarray(
        (rng.uniform(size=(H_img, W_img, 3)) * 255).astype(np.uint8))
    img.save(buf, format="JPEG")
    jpeg = buf.getvalue()

    # ranges: beam b hits ground at range 2.0 / sin(-incl)
    ranges = np.zeros((Hri, Wri, 2), np.float32)
    for b in range(Hri):
        ranges[b, :, 0] = 2.0 / np.sin(-incl[::-1][b])  # row 0 = top beam
    # per-pixel pose: identity rotation at the ego's WORLD position
    records = []
    for f in range(n_frames):
        pose = np.eye(4)
        pose[0, 3] = float(f)
        pix_pose = np.zeros((Hri, Wri, 6), np.float32)
        pix_pose[..., 3] = float(f)      # world x of the ego
        records.append(wp.encode_frame(
            pose=pose, timestamp_micros=1_000_000 * f,
            camera_calibrations=[dict(name=1, intrinsic=intr,
                                      extrinsic=cam_ext, width=W_img,
                                      height=H_img)],
            laser_calibrations=[dict(name=wp.LASER_TOP,
                                     beam_inclinations=incl,
                                     beam_inclination_min=float(incl[0]),
                                     beam_inclination_max=float(incl[-1]),
                                     extrinsic=laser_ext)],
            images=[dict(name=1, image=jpeg)],
            lasers=[dict(name=wp.LASER_TOP, range_image=ranges,
                         range_image_pose=pix_pose)]))
    tfrecord.write_records(path, records)
    return path


def test_waymo_converter_end_to_end(tmp_path):
    seg = make_waymo_segment(str(tmp_path / "segment.tfrecord"))
    dst = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_waymo.py"),
         seg, dst, "--use_color", "--use_depth"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    meta = np.load(os.path.join(dst, "cameras.npz"))
    assert meta["R"].shape == (8, 3, 3)
    assert meta["K"].shape == (8, 9)
    # every-4th-frame val split (waymo converter contract)
    assert list(meta["is_val_list"]) == [False, False, False, False,
                                         True, False, False, False]
    assert os.path.exists(os.path.join(dst, "image", "000000.jpg"))
    assert os.path.exists(os.path.join(dst, "lidar_depth", "000000.npz"))

    from adgs_tpu.data.ply import fetch_point_cloud
    xyz, rgb, t, _ = fetch_point_cloud(os.path.join(dst, "points3d.ply"))
    assert len(xyz) > 100
    # the ground ring sits at z == 0 in the rebased world frame
    assert np.percentile(np.abs(xyz[:, 2]), 90) < 0.05
    # no val-frame points
    assert set(np.unique(t).tolist()).isdisjoint({4.0})
