"""Automated physical-plan guards: the scale invariants PLANS.md documents,
pinned as tests so a refactor can't silently regress them.

- NO row-at-a-time Python (``BatchEvalPython``) in any headline plan — the
  BASELINE.json input_hint contract. Arrow-batched stages (MapInArrow /
  MapInPandas / FlatMapGroupsInPandas) are the only sanctioned Python.
- Filters reach the parquet scan (PushedFilters) on the relational queries.
- The flagship PIP join ships the polygon side NARROW through the tile
  exchange: no ``edges`` column may appear in an Exchange below the final
  edges re-attach join.
"""

from __future__ import annotations

import re

import pytest


def _plan(spark, df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    # plan-shape checks are scale-independent; the smallest fixture keeps the
    # decode/persist setup cheap
    return "/root/testdata/sf0.001"


HEADLINE_BATCH = [
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "doc_minhash_lsh",
    "doc_simhash",
    "doc_jaccard_via_lsh",       # round-4 sub-split piece mechanics
    "doc_repetition_signals",    # round-4 repetition quality signals
    "events_band_join_outer",    # round-4 left-outer band join
    "sim_cosine_topk",
    "pages_tile_counts",
    "pip_hits_per_polygon",
    "pip_hits_multi_mention",    # round-5 per-mention multiplicity
    "doc_chunk_dedup",           # round-5 CCNet chunk-level boilerplate dedup
    "doc_url_dedup",             # round-5 crawl URL canonicalization
    "doc_decontaminate",         # round-5 benchmark n-gram decontamination
    "er_customer_mentions",      # round-5 token-blocking entity resolution
    "knn_pages_to_poi",
    "tile_pyramid_z11",
    "osm_way_lengths",           # round-5 geodesic length per class
    "osm_polygon_areas",         # round-5 equal-area shoelace per class
    "osm_simplify_ways",         # round-5 effective-area generalization
    "osm_tile_road_density",     # round-5 Liang-Barsky tile clipping
    "osm_simplify_rings",        # round-5 closed-ring generalization (tail)
    "osm_tile_line_encoding",    # round-5 MVT grid-snap encoding (tail)
    "doc_bm25_terms",            # round-5 IR term weighting
    "doc_search_bm25",           # round-5 BM25 retrieval
    "doc_hll_distinct",          # round-5 HyperLogLog sketch
    "geo_grid_clusters",         # round-5 grid-density spatial clustering
    "geo_tile_hotspots",         # round-5 Getis-Ord Gi* hotspot statistics
    "doc_lang_rebalance",        # round-5 stratified corpus rebalancing
    "doc_len_hdr_quantiles",     # round-5 HDR quantile sketch
    "osm_bbox_overlaps",         # round-5 rect-rect bbox join (tail)
    "knn_idw_value",             # round-5 IDW interpolation (tail)
    "osm_page_density",          # round-5 density composition (tail)
    "doc_bloom_probe",           # round-5 Bloom membership filter (tail)
    "osm_street_bearings",       # round-5 orientation histogram (tail)
]


def test_no_row_python_in_headline_plans(spark, sf_dir):
    from openstreetmapio_jl_spark.plans import entry_queries as EQ

    reg = EQ.registry()
    for name in HEADLINE_BATCH:
        df = reg[name][0](spark, sf_dir)
        plan = _plan(spark, df)
        assert "BatchEvalPython" not in plan, f"row-at-a-time Python UDF in {name}"


def test_relational_filters_push_to_parquet_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = _plan(spark, df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThan(l_quantity" in m.group(1)
    m2 = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m2 and "l_extendedprice" not in m2.group(1)  # column pruning holds


def test_pip_polygon_side_narrow_through_tile_exchange(spark, sf_dir):
    from openstreetmapio_jl_spark.plans import entry_queries as EQ

    df = EQ.q_pip_hits_per_polygon(spark, sf_dir)
    plan = _plan(spark, df)
    # every Exchange's output attribute list must exclude the edges array —
    # edges are re-attached by polygon_id only AFTER the bbox prefilter
    for m in re.finditer(r"\(\d+\) Exchange[^\n]*\n(?:[^\n]*\n){0,3}", plan):
        block = m.group(0)
        args = re.search(r"Arguments: [^\n]*", block)
        if args:
            assert "edges" not in args.group(0), (
                "edges array rides a shuffle exchange:\n" + block
            )


def test_bucketed_entity_tables_join_without_shuffle(spark, fixture_pbf):
    """The ingest-time shuffle pays off: bucketed way_refs ⋈ nodes on the node
    id plans with ZERO shuffle exchanges (co-located SortMergeJoin) — at planet
    scale this is the difference between shuffling ~70G refs per assembly run
    and never shuffling them again after ingest."""
    from pyspark.sql import functions as F

    from openstreetmapio_jl_spark.sources.pbf_source import pbf_to_bucketed_tables

    meta = pbf_to_bucketed_tables(
        spark, fixture_pbf, n_buckets=4, table_prefix="t_bkt"
    )
    assert meta.get("bbox")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        refs = spark.table("t_bkt_way_refs")
        nodes = spark.table("t_bkt_nodes").select(
            F.col("id").alias("ref"), "lat", "lon"
        )
        joined = refs.join(nodes, "ref", "inner")
        plan = _plan(spark, joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the join is CORRECT: every ref resolves on the fixture
        n_refs = refs.count()
        assert joined.count() == n_refs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
