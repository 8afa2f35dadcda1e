"""Connected components over a pair graph — the cluster step of corpus dedup.

The dedup operators emit near-duplicate PAIRS (``jaccard_via_lsh``,
``simhash_neardup_pairs``, ``embedding_near_duplicates``); a training-data
pipeline needs CLUSTERS with one canonical survivor per cluster ("keep the
lexicographically-smallest URL, drop the rest"). Pairs→clusters is connected
components on the pair graph.

Algorithm: minimum-label propagation — every vertex repeatedly takes the min
label among itself and its neighbors; fixpoint in O(graph diameter) rounds.
Near-dup components are quasi-cliques (band co-membership generates most pairs
within a bucket), so their diameter is tiny (~2-4) and label propagation beats
the fancier alternatives on constant factors; for adversarial long-chain graphs
the large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) gives O(log²n) rounds with the same
join-aggregate round shape — swap the round body if that input ever appears.

Every round is cut with an eager ``localCheckpoint``, same as
``members.resolve_members``: each round's plan embeds the previous round's
labels twice (the neighbor join + the ``least`` merge), so without lineage
truncation the logical tree doubles per round and Catalyst analysis goes
exponential. See ``operators/members.py`` for the measured failure and the
cluster-scale note (prefer a reliable ``checkpoint()`` dir for multi-hour
production runs).

Reference scope note: the reference engine has no graph operator — this is
engine surface beyond parity, part of the LLM-pipeline layer (SURVEY.md §2
round-2/3 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.operators.members import CheckpointHandle


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    handles: list | None = None,
) -> DataFrame:
    """→ (id, component): one row per vertex appearing in ``edges``, labeled
    with the minimum vertex id reachable from it (the component's canonical
    representative). Isolated vertices never appear in ``edges`` and so never
    appear here — callers wanting singleton rows union them in afterwards.

    Vertex ids must be orderable (numeric or string); ties and determinism come
    free since min() is order-insensitive. Cycle-safe (labels only decrease).
    Raises ``RuntimeWarning`` if labels are still changing after ``max_iter``
    rounds — the labeling is then incomplete, exactly like
    ``resolve_members``'s truncation contract.

    Shuffle shape per round: one equi-join of the edge list against the label
    table keyed by vertex id + one groupBy the same key — both co-partitioned,
    so AQE folds them onto one exchange. The edge list is pairs-sized (already
    sub-quadratic by construction upstream), labels are |V| rows.

    Storage: per-round label tables stay pinned until released; pass
    ``handles`` for ``CheckpointHandle`` wrappers (release only after the
    result is consumed — checkpointed data cannot be recomputed)."""
    import warnings

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if handles is not None:
        handles.append(CheckpointHandle(e))
    labels = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    if handles is not None:
        handles.append(CheckpointHandle(labels))
    converged = False
    for _ in range(max_iter):
        nb_min = (
            e.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nb_component"))
            .withColumnRenamed("u", "id")
        )
        merged = (
            labels.join(nb_min, "id", "left")
            .select(
                "id",
                F.least("component", "nb_component").alias("component"),
                (F.col("nb_component") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        if handles is not None:
            handles.append(CheckpointHandle(merged))
        changed = merged.filter(F.col("_changed"))
        new_labels = merged.select("id", "component")
        if changed.isEmpty():
            labels = new_labels
            converged = True
            break
        labels = new_labels
    if not converged:
        warnings.warn(
            f"connected_components: labels still changing after max_iter={max_iter} "
            "rounds — labeling is INCOMPLETE (raise max_iter)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
