"""Entity resolution: token blocking + block purging + Jaccard match scoring.

The SparkER pattern (Gagliardelli et al., EDBT 2019 — "SparkER: Scaling Entity
Resolution in Spark"): schema-agnostic TOKEN BLOCKING generates candidate pairs
from shared name tokens, BLOCK PURGING drops the stop-token blocks whose
cardinality would explode the candidate join (the paper's meta-blocking
insight: a token shared by everything carries no signal and all of the cost),
and surviving candidates are scored exactly. Dedup (operators/dedup.py) links
a table to itself on near-identical TEXT; this links records ACROSS tables on
dirty, short NAMES — the record-linkage half of a data-integration pipeline.

All comparisons run on md5-free plain tokens (names are short; the token
strings themselves shuffle fine), every step is a builtin equi-join/groupBy,
and everything has an exact DuckDB twin for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def name_tokens(col: Column) -> Column:
    """ARRAY<STRING> of lowercase alphanumeric tokens of a name — the
    schema-agnostic blocking key universe. Split on non-alphanumeric runs;
    empty tokens (leading/trailing separators) filtered."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def resolve_entities(
    mentions: DataFrame,
    entities: DataFrame,
    *,
    mention_id: str = "mention_id",
    mention_name: str = "mention_name",
    entity_id: str = "entity_id",
    entity_name: str = "entity_name",
    max_block_df: int = 100,
    min_jaccard: float = 0.4,
    materialize_blocks: bool = False,
) -> DataFrame:
    """Link each mention to its best-matching entity by name-token Jaccard.

    1. **Token blocking**: explode both sides' distinct name tokens; a
       candidate pair is any (mention, entity) sharing >= 1 surviving token.
    2. **Block purging**: tokens held by more than ``max_block_df`` records
       (mentions + entities combined) are dropped BEFORE the candidate join —
       a stop token ("customer", "inc", "the") pairs everything with
       everything, turning the blocking join into a cross join at corpus
       scale; purging bounds every block to ``max_block_df`` members, so
       candidate volume is at most ``max_block_df``·|tokens|. Scoring uses
       the surviving-token universe too (purged stop tokens carry no
       discriminative signal by construction, so their absence sharpens
       Jaccard rather than distorting it) — documented trade: two records
       that share ONLY stop tokens are not comparable and produce no pair.
    3. **Scoring**: exact Jaccard over surviving token sets,
       ``|A ∩ B| / (|A| + |B| - |A ∩ B|)``; pairs below ``min_jaccard`` drop.
    4. **Resolution**: one row per matched mention — the top-scoring entity,
       ties broken by ascending entity id (deterministic across engines).

    Returns ``(mention_id, entity_id, jaccard)``. Mentions with no surviving
    candidate (all tokens purged, or nothing clears the threshold) are absent.

    Shape at scale: two explodes, one token-df groupBy (map-side combined),
    one bounded equi-join on the token, one pair groupBy, one per-mention
    window — no cross join anywhere, no Python; the block-size cap is what
    keeps the token join linear when one side is the 100-TB corpus. With
    ``materialize_blocks`` the surviving-token block index is computed once
    (4 base scans total); without it Catalyst rebuilds the index per consumer
    (12 scans), which only wins when the inputs are small enough that rescans
    beat the checkpoint write.
    """
    mtok = mentions.select(
        F.col(mention_id).alias("mid"),
        F.explode(name_tokens(F.col(mention_name))).alias("tok"),
    ).distinct()
    etok = entities.select(
        F.col(entity_id).alias("eid"),
        F.explode(name_tokens(F.col(entity_name))).alias("tok"),
    ).distinct()
    df = (
        mtok.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .unionByName(etok.groupBy("tok").agg(F.count("*").alias("c")))
        .groupBy("tok")
        .agg(F.sum("c").alias("block_df"))
        .filter(F.col("block_df") <= max_block_df)
        .select("tok")
    )
    if materialize_blocks:
        # SparkER materializes its block index for the same reason: the
        # surviving-token frame is consumed by BOTH sides' purge joins, and
        # Catalyst re-runs its full build (a scan of each input) per consumer.
        # localCheckpoint computes it once and truncates the lineage — the
        # frame is tiny (distinct sub-stop-df tokens), the inputs are the
        # 100-TB side. Opt-in because checkpointed blocks pin executor storage
        # for the session (the caller owns the session lifetime trade).
        df = df.localCheckpoint(eager=False)
    # Surviving-token set sizes ride each side as a WINDOW count instead of a
    # separate groupBy+join: Catalyst does not dedupe common subplans, so a
    # standalone msize/esize frame would re-run the whole explode+distinct+
    # block-df chain once more per use — two extra full scans of each input
    # at corpus scale. The window's mid/eid shuffle replaces the join shuffle
    # the groupBy variant needed anyway, and first() lifts the constant
    # per-key size through the candidate aggregation.
    mkeep = mtok.join(df, "tok").withColumn(
        "m_sz", F.count("*").over(Window.partitionBy("mid"))
    )
    ekeep = etok.join(df, "tok").withColumn(
        "e_sz", F.count("*").over(Window.partitionBy("eid"))
    )
    scored = (
        mkeep.join(ekeep, "tok")
        .groupBy("mid", "eid")
        .agg(
            F.count("*").alias("inter"),
            F.first("m_sz").alias("m_sz"),
            F.first("e_sz").alias("e_sz"),
        )
        .select(
            "mid",
            "eid",
            F.round(
                F.col("inter") / (F.col("m_sz") + F.col("e_sz") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    best = Window.partitionBy("mid").orderBy(F.desc("jaccard"), F.asc("eid"))
    return (
        scored.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("mid").alias(mention_id),
            F.col("eid").alias(entity_id),
            "jaccard",
        )
    )
