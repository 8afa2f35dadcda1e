"""Property tests for the round-5 geometry operators: randomized polylines
through simplify/clip/encode, checking the invariants the hand-picked unit
cases can't exhaust. One Spark job per hypothesis example (session-scoped
SparkSession), so example counts stay small."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.operators import tiler

_lat = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False, width=64)
_lon = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False, width=64)
_polyline = st.lists(st.tuples(_lat, _lon), min_size=2, max_size=6)


def _df(spark, polylines):
    rows = [
        (i, [p[0] for p in pl], [p[1] for p in pl])
        for i, pl in enumerate(polylines)
    ]
    return spark.createDataFrame(
        rows, "id long, lats array<double>, lons array<double>"
    )


@given(st.lists(_polyline, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None)
def test_clip_fractions_partition_every_segment(spark, polylines):
    """For ANY polyline (antimeridian crossings included), each nonzero
    segment's clip fractions across its tiles sum to exactly 1 — tiles
    partition the (shifted) plane — and every tile index is in range."""
    out = tiler.clip_lines_to_tiles(_df(spark, polylines), 5)
    rows = out.groupBy("id", "seg").agg(
        F.sum("clip_frac").alias("s"), F.min("x").alias("mnx"),
        F.max("x").alias("mxx"), F.min("y").alias("mny"), F.max("y").alias("mxy"),
    ).collect()
    for r in rows:
        assert abs(r.s - 1.0) < 1e-6, (r.id, r.seg, r.s)
        assert 0 <= r.mnx and r.mxx <= 31 and 0 <= r.mny and r.mxy <= 31


@given(st.lists(_polyline, min_size=1, max_size=8), st.floats(min_value=1.0, max_value=1e8))
@settings(max_examples=8, deadline=None)
def test_simplify_keeps_subsequence_and_endpoints(spark, polylines, tol):
    """For ANY polyline and tolerance: endpoints survive verbatim, the kept
    vertices are an order-preserving subsequence of the original, and
    n_kept == len(s_lats) <= n_pts."""
    out = tiler.simplify_lines(
        _df(spark, polylines), tolerance_m2=tol, ref_lat=45.0
    ).collect()
    for r in out:
        orig = list(zip(r.lats, r.lons))
        kept = list(zip(r.s_lats, r.s_lons))
        assert r.n_kept == len(kept) <= r.n_pts == len(orig)
        assert kept[0] == orig[0] and kept[-1] == orig[-1]
        it = iter(range(len(orig)))
        for v in kept:  # subsequence: strictly advancing match positions
            assert any(orig[i] == v for i in it), (v, orig)


@given(st.lists(_polyline, min_size=1, max_size=6))
@settings(max_examples=6, deadline=None)
def test_encode_quantized_coords_within_extent(spark, polylines):
    """Quantized endpoint coordinates always land inside [0, extent-1]."""
    enc = tiler.encode_tile_lines(
        tiler.clip_lines_to_tiles(_df(spark, polylines), 4, keep_params=True),
        extent=256,
    )
    agg = enc.select(
        F.least(F.min("qax"), F.min("qay"), F.min("qbx"), F.min("qby")).alias("lo"),
        F.greatest(F.max("qax"), F.max("qay"), F.max("qbx"), F.max("qby")).alias("hi"),
    ).collect()[0]
    if agg.lo is not None:
        assert 0 <= agg.lo and agg.hi <= 255
