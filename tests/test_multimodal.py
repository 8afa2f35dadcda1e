"""Multimodal plumbing (operators/multimodal.py): schema, batch shape, metadata
propagation, quarantine semantics. The codec itself is the documented
deterministic fake — these tests pin the Spark-side contract that survives a
real-codec swap."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(30):
        kind = ["img", "aud", "vid"][i % 3]
        payload = M.make_fake_payload(kind, 640 + i, 480, 12 if kind == "vid" else 1, seed=i)
        rows.append((i, f"s3://bucket/media/{i}", bytearray(payload)))
    rows.append((99, "s3://bucket/media/garbage", bytearray(b"\x00\x01not-media")))
    rows.append((100, "s3://bucket/media/null", None))
    return spark.createDataFrame(
        rows, "media_id long, uri string, payload binary"
    ).repartition(4)


def test_metadata_extraction(spark, media_df):
    out = M.extract_media_metadata(media_df)
    # passthrough columns survive, meta struct added
    assert out.columns == ["media_id", "uri", "payload", "meta"]
    rows = {r.media_id: r for r in out.collect()}
    assert rows[0].meta.kind == "image" and rows[0].meta.width == 640
    assert rows[2].meta.kind == "video" and rows[2].meta.n_frames == 12
    assert rows[1].meta.kind == "audio"
    # undecodable + null payloads → quarantined (meta null), row NOT dropped
    assert rows[99].meta is None and rows[100].meta is None
    # sha1 matches the payload bytes
    raw = bytes(rows[3].payload)
    assert rows[3].meta.sha1 == hashlib.sha1(raw).hexdigest()
    assert rows[3].meta.byte_len == len(raw)


def test_resize_rewrites_geometry_only_for_images(spark, media_df):
    out = M.extract_media_metadata(M.resize_images(media_df, 64, 64))
    rows = {r.media_id: r for r in out.collect()}
    for i, r in rows.items():
        if r.meta is None:
            continue
        if r.meta.kind == "image":
            assert (r.meta.width, r.meta.height) == (64, 64)
            assert r.meta.byte_len < 700 * 480  # body subsampled
        else:
            assert r.meta.width != 64  # non-images untouched


def test_resize_deterministic(spark, media_df):
    a = {r.media_id: r.meta.sha1 for r in M.extract_media_metadata(M.resize_images(media_df, 64, 64)).collect() if r.meta}
    b = {r.media_id: r.meta.sha1 for r in M.extract_media_metadata(M.resize_images(media_df, 64, 64)).collect() if r.meta}
    assert a == b


def test_frame_sampling_explodes_rows(spark, media_df):
    frames = M.sample_video_frames(media_df, every_n=5)
    rows = frames.collect()
    # 10 videos × frames {0,5,10} of 12
    vids = {r.media_id for r in rows}
    assert len(vids) == 10
    by_vid = [r.frame_idx for r in rows if r.media_id == 2]
    assert sorted(by_vid) == [0, 5, 10]
    # deterministic frame hashes, distinct per frame
    assert len({r.frame_sha1 for r in rows}) == len(rows)


def test_media_stats_aggregates_per_kind(spark, media_df):
    stats = {
        r.kind: r for r in M.media_stats(M.extract_media_metadata(media_df)).collect()
    }
    assert stats["image"].n == 10 and stats["audio"].n == 10 and stats["video"].n == 10
    assert stats["image"].total_bytes > 0
