"""Blob framing + codec dispatch tests — mirrors the reference's error-path suite
(``/root/reference/test/test_load_pbf.jl:418-425,559-669``,
``test/test_validation.jl:4-16``)."""

from __future__ import annotations

import struct
import zlib

import pytest

from openstreetmapio_jl_spark.pbf import blocks, proto


def _frame(blob_type: str, blob_msg: bytes) -> bytes:
    hdr = proto.field_string(1, blob_type) + proto.field_varint(3, len(blob_msg))
    return struct.pack(">I", len(hdr)) + hdr + blob_msg


def test_scan_index(fixture_pbf):
    idx = blocks.scan_blob_index(fixture_pbf)
    assert idx[0].blob_type == "OSMHeader"
    assert all(d.blob_type == "OSMData" for d in idx[1:])
    assert len(idx) >= 3  # header + >= 2 data blobs (FIXTURES.md §5)


def test_truncated_file_rejected(fixture_pbf, tmp_path):
    raw = open(fixture_pbf, "rb").read()
    p = tmp_path / "trunc.pbf"
    p.write_bytes(raw[: len(raw) // 2])
    with pytest.raises(ValueError, match="truncated"):
        blocks.scan_blob_index(str(p))


def test_not_pbf_rejected(tmp_path):
    p = tmp_path / "junk.pbf"
    p.write_bytes(b"this is not a pbf file at all")
    with pytest.raises(ValueError):
        blocks.scan_blob_index(str(p))


def test_missing_file_rejected():
    with pytest.raises(OSError):
        blocks.scan_blob_index("/tmp/does_not_exist_12345.pbf")


def test_wrong_first_blob_type(tmp_path):
    p = tmp_path / "bad.pbf"
    p.write_bytes(_frame("OSMData", b"\x00"))
    with pytest.raises(ValueError, match="OSMHeader"):
        blocks.scan_blob_index(str(p))


def test_raw_size_mismatch():
    # zlib data whose decompressed size differs from declared raw_size
    blob_msg = proto.field_varint(2, 999) + proto.field_bytes(3, zlib.compress(b"\x00" * 100))
    with pytest.raises(ValueError, match="raw_size"):
        blocks.decompress_blob(blob_msg)


def test_raw_size_zero_skips_check():
    blob_msg = proto.field_bytes(3, zlib.compress(b"hello"))
    assert blocks.decompress_blob(blob_msg) == b"hello"


def test_bzip2_arm_rejected():
    blob_msg = proto.field_varint(2, 5) + proto.field_bytes(5, b"BZh91")
    with pytest.raises(ValueError, match="bzip2"):
        blocks.decompress_blob(blob_msg)


def test_empty_blob_rejected():
    blob_msg = proto.field_varint(2, 0)
    with pytest.raises(ValueError, match="no data arm"):
        blocks.decompress_blob(blob_msg)


def test_raw_arm():
    blob_msg = proto.field_varint(2, 3) + proto.field_bytes(1, b"abc")
    assert blocks.decompress_blob(blob_msg) == b"abc"


def test_lzma_arm():
    import lzma

    data = b"lzma payload"
    blob_msg = proto.field_varint(2, len(data)) + proto.field_bytes(4, lzma.compress(data))
    assert blocks.decompress_blob(blob_msg) == data


def test_oversized_header_rejected(tmp_path):
    p = tmp_path / "big.pbf"
    p.write_bytes(struct.pack(">I", blocks.MAX_HEADER_SIZE + 1) + b"\x00" * 16)
    with pytest.raises(ValueError, match="exceeds"):
        blocks.scan_blob_index(str(p))


def test_oversized_blob_rejected(tmp_path):
    hdr = proto.field_string(1, "OSMHeader") + proto.field_varint(
        3, blocks.MAX_BLOB_SIZE + 1
    )
    p = tmp_path / "bigblob.pbf"
    p.write_bytes(struct.pack(">I", len(hdr)) + hdr)
    with pytest.raises(ValueError, match="exceeds"):
        blocks.scan_blob_index(str(p))
