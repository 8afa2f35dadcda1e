"""Property tests for the late-round-5 operators: randomized inputs through
the bbox intersection join, the HDR quantile sketch, and grid clustering,
checking the invariants the hand-picked unit cases can't exhaust. One Spark
job per hypothesis example (session-scoped SparkSession), so example counts
stay small."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from openstreetmapio_jl_spark.operators import clustering as C
from openstreetmapio_jl_spark.operators import spatial_join as SJ
from openstreetmapio_jl_spark.operators.sketches import hdr_quantile_sketch

_coord = st.floats(min_value=-80.0, max_value=80.0, allow_nan=False, width=64)
_extent = st.floats(min_value=0.01, max_value=8.0, allow_nan=False, width=64)
_rect = st.tuples(_coord, _extent, _coord, _extent)


def _rect_rows(rects):
    return [
        (i, y, y + dy, x, x + dx)
        for i, (y, dy, x, dx) in enumerate(rects)
    ]


@given(
    st.lists(_rect, min_size=1, max_size=12),
    st.lists(_rect, min_size=1, max_size=12),
    st.sampled_from([0.5, 1.0, 3.0]),
)
@settings(max_examples=8, deadline=None)
def test_bbox_join_equals_naive_for_any_rects(spark, lrects, rrects, eps):
    """For ANY rect sets and ANY cell size: the grid-cover join with
    reference-point dedup returns exactly the naive all-pairs overlap set,
    each pair exactly once."""
    lrows, rrows = _rect_rows(lrects), _rect_rows(rrects)
    schema = "{} long, min_lat double, max_lat double, min_lon double, max_lon double"
    out = SJ.bbox_intersection_join(
        spark.createDataFrame(lrows, schema.format("left_id")),
        spark.createDataFrame(rrows, schema.format("right_id")),
        cell_deg=eps,
    ).collect()
    pairs = [(r.left_id, r.right_id) for r in out]
    want = {
        (l[0], r[0])
        for l in lrows
        for r in rrows
        if l[1] <= r[2] and r[1] <= l[2] and l[3] <= r[4] and r[3] <= l[4]
    }
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == want


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300))
@settings(max_examples=8, deadline=None)
def test_hdr_quantiles_within_relative_error_for_any_ints(spark, values):
    """For ANY non-negative integer multiset: every estimated quantile is
    within 1/32 relative error of the true lower quantile (exact when the
    true value < 32)."""
    df = spark.createDataFrame([(int(v),) for v in values], "x long")
    qs = (0.25, 0.5, 0.99)
    got = {
        float(r.q): r.est
        for r in hdr_quantile_sketch(df, "x", qs).collect()
    }
    sv = sorted(values)
    for q in qs:
        true = sv[math.ceil(q * len(values)) - 1]
        if true < 32:
            assert got[q] == true, (q, got[q], true)
        else:
            assert abs(got[q] - true) / true <= 1 / 32 + 1e-12, (q, got[q], true)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=1, max_value=6),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_grid_clustering_invariants_for_any_blobs(spark, blobs):
    """For ANY set of cell-blobs: points are conserved (clustered + noise ==
    input), every cluster has >= min_pts points, and cluster ids are member
    cell keys (component minima)."""
    rows = []
    for bi, (cy, cx, n) in enumerate(blobs):
        for j in range(n):
            rows.append(
                (f"b{bi}_{j}", cy + 0.05 + 0.01 * j, cx + 0.05 + 0.01 * j)
            )
    df = spark.createDataFrame(rows, "id string, lat double, lon double")
    min_pts = 3
    clusters = C.grid_clusters(df, eps_deg=1.0, min_pts=min_pts).collect()
    labeled = C.cluster_points(df, eps_deg=1.0, min_pts=min_pts).collect()
    n_cl = sum(1 for r in labeled if r.cluster is not None)
    n_noise = sum(1 for r in labeled if r.cluster is None)
    assert n_cl + n_noise == len(rows)
    assert sum(r.n_points for r in clusters) == n_cl
    for r in clusters:
        assert r.n_points >= min_pts
    core = {
        r.cell for r in C.grid_core_cells(df, eps_deg=1.0, min_pts=min_pts).collect()
    }
    for r in clusters:
        assert r.cluster_id in core


@given(
    st.dictionaries(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        st.integers(min_value=1, max_value=100),
        min_size=2,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None)
def test_gi_star_matches_replica_for_any_raster(spark, counts):
    """For ANY small raster: gi_star equals an independent per-tile Python
    replica of the same formula (same degeneracy rules)."""
    from tests.test_spatial_stats import _replica, _run

    rows = [(x, y, n) for (x, y), n in counts.items()]
    got, want = _run(spark, rows), _replica(rows)
    assert set(got) == set(want)
    for key in want:
        gn, gw, gws, gz = got[key]
        wn, ww, wws, wz = want[key]
        assert (gn, gw, gws) == (wn, ww, wws), key
        if wz is None:
            assert gz is None, key
        else:
            assert abs(gz - wz) <= 1e-6, (key, gz, wz)
