"""Shared fixtures: one session-scoped SparkSession + deterministic fixture files."""

from __future__ import annotations

import pytest

from openstreetmapio_jl_spark.fixtures import generator as G


@pytest.fixture(scope="session")
def osm_data():
    return G.make_osm()


@pytest.fixture(scope="session")
def fixture_pbf(tmp_path_factory, osm_data):
    meta, nodes, ways, rels = osm_data
    path = str(tmp_path_factory.mktemp("fix") / "fixture.pbf")
    G.write_fixture_pbf(path, meta, nodes, ways, rels, nodes_per_block=200)
    return path


@pytest.fixture(scope="session")
def fixture_xml(tmp_path_factory, osm_data):
    meta, nodes, ways, rels = osm_data
    path = str(tmp_path_factory.mktemp("fix") / "fixture.osm")
    G.write_fixture_xml(path, meta, nodes, ways, rels)
    return path


@pytest.fixture(scope="session")
def spark():
    from openstreetmapio_jl_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
