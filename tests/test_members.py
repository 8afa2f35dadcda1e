"""Transitive member closure (Overpass ``>;``): depth, way-node expansion,
and cycle termination."""

from __future__ import annotations

from openstreetmapio_jl_spark.operators import members as M


def _relations(spark, rows):
    return spark.createDataFrame(
        [(rid, [{"ref": r, "type": t, "role": ""} for r, t in mem]) for rid, mem in rows],
        "id long, members array<struct<ref:long, type:string, role:string>>",
    )


def test_closure_depth_and_way_nodes(spark):
    # 1 -> rel 2 -> rel 3 -> way 30 -> nodes 301,302 ; 1 also has node 100 direct
    rels = _relations(
        spark,
        [
            (1, [(2, "relation"), (100, "node")]),
            (2, [(3, "relation")]),
            (3, [(30, "way")]),
        ],
    )
    ways = spark.createDataFrame([(30, [301, 302])], "id long, refs array<long>")
    out = M.resolve_members(rels, ways)
    got = {
        (r.root_id, r.kind, r.member_id) for r in out.collect() if r.root_id == 1
    }
    assert got == {
        (1, "relation", 2),
        (1, "node", 100),
        (1, "relation", 3),
        (1, "way", 30),
        (1, "node", 301),
        (1, "node", 302),
    }


def test_closure_terminates_on_cycle(spark):
    # 1 -> 2 -> 3 -> 1: a membership cycle must not loop or duplicate
    rels = _relations(
        spark,
        [
            (1, [(2, "relation")]),
            (2, [(3, "relation")]),
            (3, [(1, "relation")]),
        ],
    )
    ways = spark.createDataFrame([], "id long, refs array<long>")
    out = M.resolve_members(rels, ways, max_depth=16)
    rows = out.collect()
    assert len(rows) == len(set((r.root_id, r.kind, r.member_id) for r in rows))
    got1 = {(r.kind, r.member_id) for r in rows if r.root_id == 1}
    assert got1 == {("relation", 2), ("relation", 3), ("relation", 1)}
