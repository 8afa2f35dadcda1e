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
``algorithm="two-phase"`` selects the large-star/small-star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14) — O(log²n)
rounds independent of diameter, same join-aggregate round shape, identical
labels (test-pinned on a 1,000-vertex chain: 16 rounds vs propagation's 999).

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
    algorithm: str = "propagation",
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
    result is consumed — checkpointed data cannot be recomputed).

    ``algorithm``: ``"propagation"`` (default — min-label propagation,
    O(diameter) rounds, best constants on the quasi-clique components near-dup
    graphs produce) or ``"two-phase"`` (alternating large-star/small-star,
    Kiveris et al., SoCC'14 — O(log²n) rounds regardless of diameter; pick it
    for adversarial long-chain graphs where propagation's round count equals
    the chain length). Both return identical labels."""
    import warnings

    if algorithm == "two-phase":
        return _two_phase_cc(
            edges, src=src, dst=dst, max_iter=max_iter, handles=handles
        )
    if algorithm != "propagation":
        raise ValueError(f"algorithm must be 'propagation' or 'two-phase', got {algorithm!r}")
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


def _two_phase_cc(
    edges: DataFrame,
    *,
    src: str,
    dst: str,
    max_iter: int,
    handles: list | None,
) -> DataFrame:
    """Alternating large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) over a plain edge list:

    - LARGE-STAR: for every vertex u, each strictly-larger neighbor v is
      re-pointed at m = min(Γ(u) ∪ {u}) — emit edge (v, m);
    - SMALL-STAR: edges directed larger→smaller; for every u, its smaller
      neighbors (and u itself) re-point at the minimum neighbor.

    Each operation halves star heights multiplicatively, so the edge set
    converges to per-component stars rooted at the component MINIMUM in
    O(log²n) rounds independent of graph diameter — the regime where
    propagation (O(diameter)) degenerates. Round shape is the same
    join+groupBy-on-vertex-id as propagation, so the shuffle story at scale is
    identical; per-round ``localCheckpoint`` cuts lineage exactly as there.

    Convergence detection: the canonical directed edge set's (count,
    xxhash64-sum) signature is compared across rounds — two scalar aggregates,
    no edge-set EXCEPT join."""
    import warnings

    from openstreetmapio_jl_spark.operators.members import CheckpointHandle

    def pin(df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        if handles is not None:
            handles.append(CheckpointHandle(out))
        return out

    e = pin(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def signature(df: DataFrame) -> tuple:
        d = df.select(
            F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
        ).distinct()
        row = d.agg(
            F.count("*").alias("n"),
            # decimal accumulator: a long sum of xxhash64 values overflows
            # under ANSI mode on graphs of any real size
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    sig = signature(e)
    converged = False
    for _ in range(max_iter):
        # large-star: bidirectional neighborhoods, larger neighbors re-point
        bidir = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            bidir.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        e = pin(
            bidir.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: direct larger→smaller, smaller neighborhood re-points
        directed = (
            e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins = directed.groupBy("u").agg(F.min("v").alias("m"))
        joined = directed.join(mins, "u")
        e = pin(
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        new_sig = signature(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        warnings.warn(
            f"connected_components(two-phase): edge set still changing after "
            f"max_iter={max_iter} rounds — labeling is INCOMPLETE (raise max_iter)",
            RuntimeWarning,
            stacklevel=3,
        )
    # converged edge set = stars (child > root); labels = child rows + roots
    stars = e.select(
        F.greatest("u", "v").alias("id"), F.least("u", "v").alias("component")
    ).distinct()
    roots = (
        stars.select(F.col("component").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
    )
    return stars.unionByName(roots)
