"""Standalone TFRecord framing reader/writer (no tensorflow).

The TFRecord on-disk format is fully specified and library-independent
(tensorflow/core/lib/io/record_writer.h):

    uint64 length          (little-endian)
    uint32 masked_crc32c(length bytes)
    bytes  data[length]
    uint32 masked_crc32c(data)

with mask(crc) = ((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff and
CRC32C (Castagnoli polynomial 0x1EDC6F41, reflected 0x82F63B78).

Used by scripts/convert_waymo.py to decode Waymo Open Dataset segments
without the tensorflow dependency the reference's converter env carries;
the writer exists so tests can build byte-faithful fixtures that exercise
this exact decode path.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_CRC_TABLE: np.ndarray | None = None


def _table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = np.uint32(0x82F63B78)          # reflected Castagnoli
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, (t >> np.uint32(1)) ^ poly,
                         t >> np.uint32(1))
        _CRC_TABLE = t
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """CRC32C (Castagnoli), table-driven."""
    tab = _table()
    crc = np.uint32(0xFFFFFFFF)
    for b in np.frombuffer(data, dtype=np.uint8):
        crc = tab[(crc ^ b) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def read_records(path: str, verify: bool = True) -> Iterator[bytes]:
    """Yield the raw record payloads of a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if not hdr:
                return
            if len(hdr) != 8:
                raise IOError(f"{path}: truncated length header")
            (length,) = struct.unpack("<Q", hdr)
            (lcrc,) = struct.unpack("<I", f.read(4))
            if verify and masked_crc32c(hdr) != lcrc:
                raise IOError(f"{path}: length CRC mismatch")
            data = f.read(length)
            if len(data) != length:
                raise IOError(f"{path}: truncated record")
            (dcrc,) = struct.unpack("<I", f.read(4))
            if verify and masked_crc32c(data) != dcrc:
                raise IOError(f"{path}: data CRC mismatch")
            yield data


def write_records(path: str, records: list[bytes]) -> None:
    """Write payloads in the exact TFRecord framing (fixture builder)."""
    with open(path, "wb") as f:
        for data in records:
            hdr = struct.pack("<Q", len(data))
            f.write(hdr)
            f.write(struct.pack("<I", masked_crc32c(hdr)))
            f.write(data)
            f.write(struct.pack("<I", masked_crc32c(data)))
