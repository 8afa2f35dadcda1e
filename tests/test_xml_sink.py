"""Sharded XML sink: executor-side encode, round-trip through the XML reader.

The XML READ path drops Info by design (reference asymmetry,
``src/load_xml.jl:215,230,245``), so the round-trip bar here is everything
except info: ids, coords, tags, refs, members — plus NULL info on every
re-read row.
"""

from __future__ import annotations

import os

import pytest

from openstreetmapio_jl_spark.sinks import write_bundle_xml, write_xml_sharded
from openstreetmapio_jl_spark.sources.pbf_source import read_pbf
from openstreetmapio_jl_spark.sources.xml_source import read_osm

_KEEP = {
    "nodes": ["id", "lat", "lon", "tags"],
    "ways": ["id", "refs", "tags"],
    "relations": ["id", "members", "tags"],
}


def _canon(df, kind):
    rows = {}
    for r in df.select(*_KEEP[kind]).collect():
        d = r.asDict(recursive=True)
        tags = d.get("tags")
        d["tags"] = dict(sorted(tags.items())) if tags else None
        rows[d["id"]] = d
    return rows


@pytest.fixture(scope="module")
def xml_roundtrip(spark, fixture_pbf, tmp_path_factory):
    src = read_pbf(spark, fixture_pbf)
    out = str(tmp_path_factory.mktemp("xsink") / "sharded")
    manifest = write_bundle_xml(src, out, shards=3)
    back = read_osm(spark, sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".osm")
    ))
    return src, back, out, manifest


@pytest.mark.parametrize("kind", ["nodes", "ways", "relations"])
def test_xml_roundtrip_entities(xml_roundtrip, kind):
    src, back, _, _ = xml_roundtrip
    a, b = _canon(getattr(src, kind), kind), _canon(getattr(back, kind), kind)
    assert len(a) == len(b) and set(a) == set(b)
    for i in a:
        assert a[i] == b[i], f"{kind} id={i}"


def test_xml_readback_drops_info(xml_roundtrip):
    # preserved reference asymmetry: XML parse never populates info
    _, back, _, _ = xml_roundtrip
    for kind in ("nodes", "ways", "relations"):
        df = getattr(back, kind)
        assert df.filter("info IS NOT NULL").count() == 0


def test_xml_manifest_and_bounds(xml_roundtrip):
    src, back, out, manifest = xml_roundtrip
    kinds = {m["kind"] for m in manifest}
    assert kinds == {"nodes", "ways", "relations"}
    for m in manifest:
        assert m["rows"] > 0 and os.path.getsize(m["path"]) == m["bytes"]
    assert not [f for f in os.listdir(out) if ".tmp-" in f]
    assert back.meta.get("bbox") == src.meta.get("bbox")


def test_xml_kind_validation(spark):
    df = spark.range(1).withColumnRenamed("id", "x")
    with pytest.raises(ValueError, match="kind must be one of"):
        write_xml_sharded(df, "points", "/tmp/never")


def test_whitespace_and_control_chars_in_tag_values(spark, tmp_path):
    """Literal \n/\t/\r in tag values round-trip via character references
    (attribute-value normalization would fold them to spaces otherwise);
    C0 controls outside \t\n\r are stripped (unrepresentable in XML 1.0)."""
    val = "line1\nline2\tcol\rcr"
    dirty = "a\x01b\x0cc"  # \x01, \x0c have no XML 1.0 representation
    nodes = spark.createDataFrame(
        [(1, 10.0, 20.0, {"note": val, "dirty": dirty})],
        "id long, lat double, lon double, tags map<string,string>",
    )
    out = str(tmp_path / "ws")
    write_xml_sharded(nodes, "nodes", out)
    files = sorted(os.path.join(out, f) for f in os.listdir(out) if f.endswith(".osm"))
    back = read_osm(spark, files).nodes.collect()
    assert len(back) == 1
    tags = dict(back[0].tags)
    assert tags["note"] == val  # byte-identical, incl. \n \t \r
    assert tags["dirty"] == "abc"  # C0 stripped, not crashed on
