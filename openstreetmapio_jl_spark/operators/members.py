"""Transitive member resolution — the Overpass ``>;`` recursion, natively.

The reference delegates "fetch all members of matched elements" to the Overpass
server (the ``>;`` clause in its query template,
``/root/reference/src/load_overpass.jl:82-92``) and stores relation members raw
(parallel ref/type/role arrays, ``src/map_types.jl:149-155``) — relations may
reference other relations, so full resolution is a transitive closure
(SURVEY.md §3.3). This operator computes that closure distributedly:

- iterative frontier expansion (semi-naive datalog): each round joins only the
  NEW relation-type edges against the membership edge list, anti-joins against
  everything already reached, and stops at fixpoint — cycle-safe, and each round
  is one equi-join shuffle keyed by relation id;
- member ways are then expanded to their node refs (the ``out skel`` step).

At planet scale the edge list is ~10^7 rows (relations × avg members) — tiny
next to the node table — so every join here broadcasts or hashes cheaply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def member_edges(relations: DataFrame) -> DataFrame:
    """relations → (src, type, ref): one row per membership edge."""
    return relations.select(F.col("id").alias("src"), F.explode("members").alias("m")).select(
        "src", F.col("m.type").alias("type"), F.col("m.ref").alias("ref")
    )


def resolve_members(
    relations: DataFrame,
    ways: DataFrame,
    *,
    max_depth: int = 16,
) -> DataFrame:
    """→ (root_id, kind, member_id): every element transitively reachable from
    each relation — direct members, members of member relations (recursively),
    and the node refs of every reachable way. Distinct rows."""
    edges = member_edges(relations).persist()
    reach = edges.select(F.col("src").alias("root"), "type", "ref").persist()
    frontier = reach.filter(F.col("type") == "relation")
    for _ in range(max_depth):
        if frontier.isEmpty():
            break
        nxt = (
            frontier.select(F.col("ref").alias("src"), "root")
            .join(edges, "src", "inner")
            .select("root", "type", "ref")
        )
        # anti-join vs everything reached: semi-naive delta, also the cycle guard
        new = nxt.join(reach, ["root", "type", "ref"], "left_anti").persist()
        if new.isEmpty():
            break
        reach = reach.unionByName(new).persist()
        frontier = new.filter(F.col("type") == "relation")
    way_nodes = (
        reach.filter(F.col("type") == "way")
        .join(ways.select(F.col("id").alias("ref"), "refs"), "ref", "inner")
        .select("root", F.explode("refs").alias("nref"))
        .select("root", F.lit("node").alias("type"), F.col("nref").alias("ref"))
    )
    return (
        reach.unionByName(way_nodes)
        .distinct()
        .select(
            F.col("root").alias("root_id"),
            F.col("type").alias("kind"),
            F.col("ref").alias("member_id"),
        )
    )
