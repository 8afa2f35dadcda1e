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
