"""Overpass source (sources/overpass_source.py) — fully offline: query-building
golden values, URL encoding, endpoint failover with an injected fetcher routing
the fixture XML through the shared parse path, and the native around-radius
operator vs a brute-force haversine oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.fixtures import generator as G
from openstreetmapio_jl_spark.functions import geo
from openstreetmapio_jl_spark.sources import overpass_source as O


def test_bounds_strings():
    assert O.bbox_bounds(54.0, 9.0, 55.0, 10.0) == "54.0,9.0,55.0,10.0"
    assert O.around_bounds(54.2619665, 9.9854149, 1000) == "around:1000,54.2619665,9.9854149"


def test_build_query_template():
    q = O.build_query("54.0,9.0,55.0,10.0", timeout=15)
    # tab-indented lines, matching the reference template's runtime value
    # (Julia triple-quote dedent removes nothing: tab-indented body lines share
    # no whitespace prefix with the space-indented closing delimiter)
    assert q.startswith("\t[out:xml][timeout:15];\n\t(\n\t\tnode(")
    for part in (
        "\t\tnode(54.0,9.0,55.0,10.0);\n",
        "\t\tway(",
        "\t\trelation(",
        "\t);\n",
        "\tout body;\n",
        "\t>;\n",
        "\tout skel qt;\n",
    ):
        assert part in q


def test_fetch_failover_and_parse(spark, tmp_path):
    """First endpoint errors → second serves the fixture XML → parsed counts
    equal a direct XML read (same parse path end-to-end)."""
    meta, nodes, ways, rels = G.make_osm()
    xml_path = str(tmp_path / "fixture.osm")
    G.write_fixture_xml(xml_path, meta, nodes, ways, rels)
    with open(xml_path, "rb") as f:
        body = f.read()

    calls = []

    def fetcher(url, timeout):
        calls.append(url)
        if "overpass-api.de" in url and "lz4" not in url:
            raise ConnectionError("primary down")
        return body

    bundle = O.fetch_overpass(spark, O.bbox_bounds(54.0, 9.0, 55.0, 10.0), fetcher=fetcher)
    assert len(calls) == 2  # failover happened
    assert "data=%09%5Bout%3Axml%5D" in calls[0]  # url_encode applied (tab-led template)
    assert bundle.nodes.count() == len(nodes)
    assert bundle.ways.count() == len(ways)
    assert bundle.relations.count() == len(rels)


def test_fetch_all_endpoints_fail_rethrows_last(spark):
    def fetcher(url, timeout):
        raise TimeoutError(f"no network: {url}")

    with pytest.raises(TimeoutError):
        O.fetch_overpass(spark, "0,0,1,1", fetcher=fetcher)


def test_radius_query_matches_bruteforce(spark):
    meta, nodes, _, _ = G.make_osm()
    df = spark.createDataFrame(
        [(n["id"], n["lat"], n["lon"]) for n in nodes], "id long, lat double, lon double"
    )
    clat, clon, radius = G.TEST_POINT[0], G.TEST_POINT[1], 120.0
    got = {r.id for r in O.radius_query(df, clat, clon, radius).collect()}

    def hav(lat, lon):
        h = (
            math.sin(math.radians(lat - clat) / 2) ** 2
            + math.cos(math.radians(clat))
            * math.cos(math.radians(lat))
            * math.sin(math.radians(lon - clon) / 2) ** 2
        )
        return 2 * geo.EARTH_RADIUS_M * math.asin(math.sqrt(h))

    want = {n["id"] for n in nodes if hav(n["lat"], n["lon"]) <= radius}
    assert got == want and len(want) > 0


def test_radius_query_prefilter_is_sargable(spark):
    """The bbox prefilter must reach the parquet scan as a pushed filter."""
    import re

    meta, nodes, _, _ = G.make_osm()
    df = spark.createDataFrame(
        [(n["id"], n["lat"], n["lon"]) for n in nodes], "id long, lat double, lon double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/nodes")
        pq = spark.read.parquet(f"{d}/nodes")
        plan = O.radius_query(pq, G.TEST_POINT[0], G.TEST_POINT[1], 500.0)._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(lat", plan)
