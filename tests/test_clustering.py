"""Grid-density spatial clustering (operators/clustering.py).

Hand-built point sets with known cluster structure: memberships, adjacency
merging (incl. diagonal), min_pts boundary, negative-coordinate flooring,
noise labeling, centroid exactness, and propagation==two-phase equality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.operators import clustering as C


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id string, lat double, lon double")


def _blob(tag, lat, lon, n):
    """n points jittered inside one 1-degree cell around (lat, lon)."""
    return [
        (f"{tag}{i}", lat + 0.01 * i, lon + 0.01 * i) for i in range(n)
    ]


def test_two_blobs_and_noise(spark):
    # blob A: 5 points near (10.5, 10.5); blob B: 4 points near (50.5, 50.5);
    # 2 isolated noise points. eps=1, min_pts=3 -> exactly 2 clusters.
    rows = (
        _blob("a", 10.5, 10.5, 5)
        + _blob("b", 50.5, 50.5, 4)
        + [("n1", -30.5, 70.5), ("n2", 5.5, -120.5)]
    )
    out = C.grid_clusters(_pts(spark, rows), eps_deg=1.0, min_pts=3).collect()
    assert len(out) == 2
    by_n = {r.n_points: r for r in out}
    assert set(by_n) == {5, 4}
    assert all(r.n_cells == 1 for r in out)
    # centroid of blob A: mean of 10.5..10.54 = 10.52 exactly
    a = by_n[5]
    assert float(a.avg_lat) == pytest.approx(10.52, abs=1e-6)
    assert float(a.avg_lon) == pytest.approx(10.52, abs=1e-6)


def test_noise_points_labeled_null(spark):
    rows = _blob("a", 10.5, 10.5, 4) + [("n1", -30.5, 70.5)]
    out = C.cluster_points(_pts(spark, rows), eps_deg=1.0, min_pts=3)
    labeled = {r.id: r.cluster for r in out.collect()}
    assert labeled["n1"] is None
    core_labels = {v for k, v in labeled.items() if k.startswith("a")}
    assert len(core_labels) == 1 and None not in core_labels
    # every input row survives (left join keeps noise)
    assert len(labeled) == 5


def test_adjacent_cells_merge_including_diagonal(spark):
    # three dense cells: (10,10), (11,11) [diagonal], (12,11) [edge-adjacent
    # to (11,11)] -> ONE cluster spanning 3 cells; a dense cell at (20,20)
    # stays separate.
    rows = (
        _blob("a", 10.1, 10.1, 3)
        + _blob("b", 11.1, 11.1, 3)
        + _blob("c", 11.1, 12.1, 3)  # lat band 11, lon band 12
        + _blob("d", 20.1, 20.1, 3)
    )
    out = C.grid_clusters(_pts(spark, rows), eps_deg=1.0, min_pts=3).collect()
    assert sorted((r.n_cells, r.n_points) for r in out) == [(1, 3), (3, 9)]


def test_min_pts_boundary_exact(spark):
    # exactly min_pts points IS core; min_pts-1 is not
    rows = _blob("a", 10.5, 10.5, 3) + _blob("b", 50.5, 50.5, 2)
    out = C.grid_clusters(_pts(spark, rows), eps_deg=1.0, min_pts=3).collect()
    assert len(out) == 1 and out[0].n_points == 3


def test_negative_coordinates_floor(spark):
    # floor(-0.5) = -1: points at small negative coords land in cell (-1,-1),
    # NOT cell (0,0) — truncation-toward-zero would wrongly merge them with
    # the positive-quadrant blob into one cell.
    rows = [(f"p{i}", -0.5 + 0.01 * i, -0.5 + 0.01 * i) for i in range(3)] + [
        (f"q{i}", 0.5 + 0.01 * i, 0.5 + 0.01 * i) for i in range(3)
    ]
    out = C.grid_clusters(_pts(spark, rows), eps_deg=1.0, min_pts=3).collect()
    # the two cells ARE diagonal neighbors -> one cluster, but two cells
    assert len(out) == 1 and out[0].n_cells == 2 and out[0].n_points == 6


def test_cluster_id_is_min_cell_key(spark):
    rows = _blob("a", 10.1, 10.1, 3) + _blob("b", 11.1, 11.1, 3)
    core = C.grid_core_cells(_pts(spark, rows), eps_deg=1.0, min_pts=3)
    keys = sorted(r.cell for r in core.collect())
    out = C.grid_clusters(_pts(spark, rows), eps_deg=1.0, min_pts=3).collect()
    assert len(out) == 1 and out[0].cluster_id == keys[0]


def test_out_of_range_and_null_coords_dropped(spark):
    rows = _blob("a", 10.5, 10.5, 3) + [
        ("bad1", 91.0, 10.5),
        ("bad2", 10.5, 181.0),
        ("bad3", None, 10.5),
    ]
    out = C.grid_clusters(_pts(spark, rows), eps_deg=1.0, min_pts=3).collect()
    assert len(out) == 1 and out[0].n_points == 3


def test_all_three_algorithms_agree(spark):
    # a chain of 6 adjacent dense cells plus two singleton-core outliers:
    # auto (driver union-find), propagation, and two-phase must return
    # identical clusters
    rows = []
    for k in range(6):
        rows += _blob(f"c{k}_", 10.1 + k, 10.1, 3)
    rows += _blob("s1_", 40.1, 40.1, 3) + _blob("s2_", -40.9, -40.9, 3)
    df = _pts(spark, rows)
    results = []
    for alg in ("auto", "propagation", "two-phase"):
        results.append({
            (r.cluster_id, r.n_cells, r.n_points, str(r.avg_lat), str(r.avg_lon))
            for r in C.grid_clusters(
                df, eps_deg=1.0, min_pts=3, algorithm=alg
            ).collect()
        })
    assert results[0] == results[1] == results[2]
    assert sorted(x[1] for x in results[0]) == [1, 1, 6]


def test_auto_overflow_falls_back_to_distributed(spark):
    # local_threshold=1 forces the probe to overflow -> distributed path;
    # labels must still equal the local path's
    rows = _blob("a", 10.1, 10.1, 3) + _blob("b", 11.1, 11.1, 3) + _blob(
        "c", 40.1, 40.1, 3
    )
    core = C.grid_core_cells(_pts(spark, rows), eps_deg=1.0, min_pts=3)
    local = {
        (r.cell, r.cluster) for r in C.core_cell_labels(core).collect()
    }
    forced = {
        (r.cell, r.cluster)
        for r in C.core_cell_labels(core, local_threshold=1).collect()
    }
    assert local == forced and len(local) == 3


def test_param_validation(spark):
    df = _pts(spark, [("a", 1.0, 1.0)])
    with pytest.raises(ValueError, match="eps_deg"):
        C.grid_clusters(df, eps_deg=0.0)
    with pytest.raises(ValueError, match="min_pts"):
        C.grid_clusters(df, min_pts=0)


def test_jvm_only_plan(spark):
    # the whole pipeline is Catalyst column math + joins — no Python rows
    rows = _blob("a", 10.1, 10.1, 3) + _blob("b", 11.1, 11.1, 3)
    plan = C.grid_clusters(
        _pts(spark, rows), eps_deg=1.0, min_pts=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# bbox_intersection_join (operators/spatial_join.py) — grid-cover rect join
# with reference-point dedup; exactness pinned against a naive cross join
# ---------------------------------------------------------------------------
from openstreetmapio_jl_spark.operators import spatial_join as SJ


def _rects(spark, rows, idc):
    return spark.createDataFrame(
        rows, f"{idc} long, min_lat double, max_lat double, min_lon double, max_lon double"
    )


def _naive_pairs(lrows, rrows):
    out = set()
    for lid, lminy, lmaxy, lminx, lmaxx in lrows:
        for rid, rminy, rmaxy, rminx, rmaxx in rrows:
            if (
                lminy <= rmaxy and rminy <= lmaxy
                and lminx <= rmaxx and rminx <= lmaxx
            ):
                out.add((lid, rid))
    return out


def test_bbox_join_exact_pairs_and_touching_edges(spark):
    left = [
        (1, 0.0, 2.0, 0.0, 2.0),
        (2, 10.0, 11.0, 10.0, 11.0),
        (3, -5.0, -4.0, -5.0, -4.0),
    ]
    right = [
        (10, 1.0, 3.0, 1.0, 3.0),    # overlaps 1
        (11, 2.0, 4.0, 2.0, 4.0),    # TOUCHES 1 at the corner (closed edges)
        (12, 50.0, 51.0, 50.0, 51.0),  # disjoint
    ]
    got = {
        (r.left_id, r.right_id)
        for r in SJ.bbox_intersection_join(
            _rects(spark, left, "left_id"), _rects(spark, right, "right_id")
        ).collect()
    }
    assert got == _naive_pairs(left, right) == {(1, 10), (1, 11)}


def test_bbox_join_no_duplicates_across_cells(spark):
    # boxes spanning MANY 1-degree cells: every surviving pair must appear
    # exactly once (reference-point dedup), matching the naive join
    left = [(1, 0.0, 7.5, 0.0, 9.5), (2, -3.5, 3.5, -3.5, 3.5)]
    right = [(10, 5.0, 12.0, 5.0, 12.0), (11, -1.0, 1.0, -20.0, 20.0)]
    rows = SJ.bbox_intersection_join(
        _rects(spark, left, "left_id"), _rects(spark, right, "right_id")
    ).collect()
    pairs = [(r.left_id, r.right_id) for r in rows]
    assert len(pairs) == len(set(pairs))  # no dup reports
    assert set(pairs) == _naive_pairs(left, right)


def test_bbox_join_cell_size_invariance(spark):
    import hashlib

    def h(i, lo, hi):
        v = int(hashlib.md5(f"{i}".encode()).hexdigest()[:6], 16)
        return lo + (v % 1000) / 1000.0 * (hi - lo)

    left = [
        (i, h(i, -10, 10), h(i, -10, 10) + h(i + 500, 0.1, 6), h(i + 1000, -10, 10),
         h(i + 1000, -10, 10) + h(i + 1500, 0.1, 6))
        for i in range(40)
    ]
    right = [
        (i, h(i + 7, -10, 10), h(i + 7, -10, 10) + h(i + 777, 0.1, 6),
         h(i + 70, -10, 10), h(i + 70, -10, 10) + h(i + 7000, 0.1, 6))
        for i in range(40)
    ]
    want = _naive_pairs(left, right)
    for eps in (0.5, 1.0, 5.0):
        got = {
            (r.left_id, r.right_id)
            for r in SJ.bbox_intersection_join(
                _rects(spark, left, "left_id"),
                _rects(spark, right, "right_id"),
                cell_deg=eps,
            ).collect()
        }
        assert got == want, eps


def test_bbox_join_validation(spark):
    import pytest as _pt

    df = _rects(spark, [(1, 0.0, 1.0, 0.0, 1.0)], "left_id")
    with _pt.raises(ValueError, match="cell_deg"):
        SJ.bbox_intersection_join(df, df, cell_deg=0)


def test_bbox_join_plan_has_no_dedup_operator(spark):
    # the reference-point rule replaces the distinct: the physical plan must
    # contain NO deduplication operator (and no Python)
    left = _rects(spark, [(1, 0.0, 7.5, 0.0, 9.5)], "left_id")
    right = _rects(spark, [(10, 5.0, 12.0, 5.0, 12.0)], "right_id")
    plan = (
        SJ.bbox_intersection_join(left, right)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Deduplicate" not in plan and "Distinct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# zonal_stats (operators/tiler.py) — raster→vector center-point aggregation
# ---------------------------------------------------------------------------
from openstreetmapio_jl_spark.operators import tiler as T


def test_zonal_stats_center_rule_exact(spark):
    # a polygon spanning exactly tiles x in [2,3], y in [1,2] at z=3 ... build
    # from tile bounds so center membership is unambiguous
    z = 3
    from openstreetmapio_jl_spark.functions.cells import tile_bounds

    # polygon = the union extent of tiles (2,1) and (3,1), shrunk slightly so
    # only those two tile CENTERS are inside
    s, w, n_, e = tile_bounds(2, 1, z)
    s2, w2, n2, e2 = tile_bounds(3, 1, z)
    lat_lo, lat_hi = s + 0.1, n_ - 0.1
    lon_lo, lon_hi = w + 0.1, e2 - 0.1
    ring = [
        (lat_lo, lon_lo), (lat_lo, lon_hi), (lat_hi, lon_hi), (lat_hi, lon_lo)
    ]
    edges = [
        (ring[j][0], ring[j][1], ring[(j + 1) % 4][0], ring[(j + 1) % 4][1])
        for j in range(4)
    ]
    polys = spark.createDataFrame(
        [(7, edges, lat_lo, lat_hi, lon_lo, lon_hi)],
        "id long, edges array<struct<y1 double, x1 double, y2 double, x2 double>>,"
        " min_lat double, max_lat double, min_lon double, max_lon double",
    )
    key = lambda x, y: z * (1 << 58) + x * (1 << 29) + y
    raster = spark.createDataFrame(
        [(key(2, 1), 10), (key(3, 1), 20), (key(4, 1), 99), (key(2, 2), 99)],
        "tile long, n long",
    )
    out = T.zonal_stats(polys, raster, zoom=z).collect()
    assert len(out) == 1
    assert out[0].polygon_id == 7 and out[0].n_tiles == 2 and out[0].total == 30


def test_tile_center_inverts_tile_assignment(spark):
    # for a grid of tiles: re-assigning each computed center to a tile at the
    # same zoom returns the original tile key (center is interior)
    from pyspark.sql import functions as F

    from openstreetmapio_jl_spark.functions.cells import xyz_tile_key_col

    z = 7
    keys = [
        z * (1 << 58) + x * (1 << 29) + y
        for x in (0, 3, 64, 127)
        for y in (0, 5, 64, 127)
    ]
    df = spark.createDataFrame([(k,) for k in keys], "tile long")
    clat, clon = T.tile_center_cols(F.col("tile"), z)
    back = df.select(
        "tile", xyz_tile_key_col(clat, clon, z).alias("back")
    ).collect()
    for r in back:
        assert r.tile == r.back, r
