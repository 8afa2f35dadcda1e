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
    handles: list | None = None,
) -> DataFrame:
    """→ (root_id, kind, member_id): every element transitively reachable from
    each relation — direct members, members of member relations (recursively),
    and the node refs of every reachable way. Distinct rows.

    Raises a ``RuntimeWarning`` (via ``warnings.warn``) when the frontier is
    still non-empty after ``max_depth`` rounds: the closure is then INCOMPLETE,
    and the differential against an unbounded-recursion oracle would otherwise
    fail with no signal about the cause. Real OSM relation nesting is ≤ ~10
    levels, so the default depth is safely past fixpoint in practice.

    Storage: per-round deltas persist and stay persisted until the returned
    DataFrame is consumed — pass ``handles`` (a list) to receive the persisted
    handles for cleanup. Unpersisting superseded rounds mid-run was measured
    and rejected (see knn_join: Spark's CacheManager clears dependent caches on
    ancestor unpersist — recacheByPlan — and the accumulated lineage re-runs).
    The deltas are membership-edge-sized (tiny next to the node table), so the
    pinned bytes are bounded by the closure size itself."""
    import warnings

    edges = member_edges(relations).persist()
    reach = edges.select(F.col("src").alias("root"), "type", "ref").persist()
    if handles is not None:
        handles.extend([edges, reach])
    frontier = reach.filter(F.col("type") == "relation")
    converged = False
    for _ in range(max_depth):
        if frontier.isEmpty():
            converged = True
            break
        nxt = (
            frontier.select(F.col("ref").alias("src"), "root")
            .join(edges, "src", "inner")
            .select("root", "type", "ref")
        )
        # anti-join vs everything reached: semi-naive delta, also the cycle guard
        new = nxt.join(reach, ["root", "type", "ref"], "left_anti").persist()
        if handles is not None:
            handles.append(new)
        if new.isEmpty():
            converged = True
            break
        reach = reach.unionByName(new).persist()
        if handles is not None:
            handles.append(reach)
        frontier = new.filter(F.col("type") == "relation")
    if not converged and not frontier.isEmpty():
        warnings.warn(
            f"resolve_members: closure truncated at max_depth={max_depth} with a "
            "non-empty frontier — result is INCOMPLETE (raise max_depth)",
            RuntimeWarning,
            stacklevel=2,
        )
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
