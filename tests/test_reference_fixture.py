"""Parity against the reference's REAL bundled fixtures.

Every other test in this repo runs against a synthetic mirror of the reference's
data; this file pins the engine against the reference's OWN files —
``/root/reference/test/data/map.pbf`` (9.6 KB) and ``map.osm`` (145 KB) — and
asserts the reference's own golden values:

- counts 612 nodes / 29 ways / 3 relations (``test/TestUtils.jl:19-44``),
- node 1675598406 at (54.2619665, 9.9854149) with addr:country=DE + city/
  postcode/street tags (``test/test_load_xml.jl:23-33``),
- way 889648159: 56 refs, refs[23] (1-based) == 1276389426, exactly 2 tags
  wetland=wet_meadow / natural=wetland (``test/test_load_pbf.jl:23-61``,
  ``test/test_load_xml.jl:39-45``),
- relation 12475101: type/route/from/to tags (``test/test_load_xml.jl:46-58``),
- full XML == PBF equality per element (``test/test_load_xml.jl:222-256``).

The fixture files are read-only inputs; nothing here writes to /root/reference.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF_PBF = "/root/reference/test/data/map.pbf"
REF_OSM = "/root/reference/test/data/map.osm"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_PBF) and os.path.exists(REF_OSM)),
    reason="reference fixture files not present",
)

KNOWN_NODE_ID = 1675598406
KNOWN_WAY_ID = 889648159
KNOWN_RELATION_ID = 12475101


@pytest.fixture(scope="module")
def ref_pbf(spark):
    from openstreetmapio_jl_spark.sources.pbf_source import read_pbf

    b = read_pbf(spark, REF_PBF, single_pass=True)
    yield b
    b.union.unpersist()


@pytest.fixture(scope="module")
def ref_xml(spark):
    from openstreetmapio_jl_spark.sources.xml_source import read_osm

    return read_osm(spark, REF_OSM)


def test_reference_pbf_counts(ref_pbf):
    assert ref_pbf.nodes.count() == 612
    assert ref_pbf.ways.count() == 29
    assert ref_pbf.relations.count() == 3


def test_reference_golden_node(ref_pbf):
    n = ref_pbf.nodes.filter(F.col("id") == KNOWN_NODE_ID).collect()
    assert len(n) == 1
    node = n[0]
    assert node.lat == 54.2619665
    assert node.lon == 9.9854149
    assert node.tags["addr:country"] == "DE"
    for key in ("addr:city", "addr:postcode", "addr:street"):
        assert key in node.tags


def test_reference_golden_way(ref_pbf):
    w = ref_pbf.ways.filter(F.col("id") == KNOWN_WAY_ID).collect()
    assert len(w) == 1
    way = w[0]
    assert len(way.refs) == 56
    assert way.refs[22] == 1276389426  # reference asserts refs[23] 1-indexed
    assert dict(way.tags) == {"wetland": "wet_meadow", "natural": "wetland"}


def test_reference_golden_relation(ref_pbf):
    r = ref_pbf.relations.filter(F.col("id") == KNOWN_RELATION_ID).collect()
    assert len(r) == 1
    rel = r[0]
    assert rel.tags["type"] == "route"
    for key in ("route", "from", "to"):
        assert key in rel.tags
    assert len(rel.members) > 0
    # parallel-array zip invariant: every member has type and role resolved
    assert all(m.type in ("node", "way", "relation") for m in rel.members)
    assert all(m.role is not None for m in rel.members)


def test_reference_xml_equals_pbf(ref_pbf, ref_xml):
    """The reference's cross-format oracle: decode(map.osm) == decode(map.pbf)
    per element (ids, coordinates, refs, members, tags). Info is excluded — the
    reference's XML path never populates it (``src/load_xml.jl:215,230,245``)."""
    assert ref_xml.nodes.count() == 612
    assert ref_xml.ways.count() == 29
    assert ref_xml.relations.count() == 3

    def canon_nodes(df):
        return {
            (r.id, r.lat, r.lon, tuple(sorted((r.tags or {}).items())))
            for r in df.select("id", "lat", "lon", "tags").collect()
        }

    def canon_ways(df):
        return {
            (r.id, tuple(r.refs), tuple(sorted((r.tags or {}).items())))
            for r in df.select("id", "refs", "tags").collect()
        }

    def canon_rels(df):
        return {
            (
                r.id,
                tuple((m.ref, m.type, m.role) for m in r.members),
                tuple(sorted((r.tags or {}).items())),
            )
            for r in df.select("id", "members", "tags").collect()
        }

    assert canon_nodes(ref_xml.nodes) == canon_nodes(ref_pbf.nodes)
    assert canon_ways(ref_xml.ways) == canon_ways(ref_pbf.ways)
    assert canon_rels(ref_xml.relations) == canon_rels(ref_pbf.relations)


def test_reference_bbox_meta(ref_pbf, ref_xml):
    bb_p = ref_pbf.meta.get("bbox")
    bb_x = ref_xml.meta.get("bbox")
    assert bb_p and bb_x
    for key in ("bottom_lat", "left_lon", "top_lat", "right_lon"):
        assert abs(bb_p[key] - bb_x[key]) < 1e-6
