"""proto2 codec unit tests — incl. property tests for varint/zigzag round-trips."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openstreetmapio_jl_spark.pbf import proto


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_unsigned(values):
    payload = b"".join(proto.encode_varint(v) for v in values)
    out = proto.decode_varints(payload)
    assert [int(v) for v in out] == values


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_zigzag_roundtrip(values):
    payload = b"".join(proto.encode_varint(proto.zigzag_encode(v)) for v in values)
    out = proto.varints_zigzag(proto.decode_varints(payload))
    assert [int(v) for v in out] == values


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=100))
@settings(max_examples=30, deadline=None)
def test_packed_field_roundtrip(values):
    msg = proto.packed_varints(7, values, zigzag=True)
    fields = list(proto.iter_fields(msg))
    assert len(fields) == 1
    fno, wt, payload = fields[0]
    assert fno == 7 and wt == proto.WT_LEN
    out = proto.decode_packed(payload, zigzag=True)
    assert [int(v) for v in out] == values


def test_negative_int64_encoding():
    # proto2 int64: negatives are 10-byte two's-complement varints
    payload = proto.encode_varint(-5)
    assert len(payload) == 10
    out = proto.varints_to_int64(proto.decode_varints(payload))
    assert out[0] == -5


def test_delta_encode_roundtrip():
    vals = [100, 105, 103, 200, -50]
    deltas = proto.delta_encode(vals)
    assert list(np.cumsum(deltas)) == vals


def test_truncated_varint_rejected():
    try:
        proto.decode_varints(b"\xff\xff")  # continuation bit set on last byte
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_iter_fields_overrun_rejected():
    # LEN field declaring more bytes than remain
    bad = proto.tag(1, proto.WT_LEN) + proto.encode_varint(100) + b"xy"
    try:
        list(proto.iter_fields(bad))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
