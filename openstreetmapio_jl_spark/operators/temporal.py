"""Temporal band (interval-proximity) join — the 1-D twin of the cell-keyed
spatial join.

Spark has no native band join: ``a JOIN b ON abs(a.ts - b.ts) <= gap`` planned
naively is a broadcast-nested-loop (O(|a|·|b|) — dead at scale). The same trick
that makes the spatial join scale applies in one dimension: bucket time into
``gap``-sized bins, equi-join on the bin key with the left side exploded to its
±1 neighborhood, then apply the exact band predicate. Every qualifying pair
lands in exactly one joined bucket (the RIGHT row's own bin), so no dedup is
needed; candidate volume is bounded by bin density, and the join is a plain
shuffled (or broadcast) hash equi-join Catalyst/AQE can optimize.

The reference has no temporal operators at all (SURVEY.md §2 Table B) — this is
engine surface for the web-scale side (e.g. correlating crawl events within a
time band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    gap_s: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Pairs (l, r) with ``|l.<left_ts> - r.<right_ts>| <= gap_s`` (timestamps
    compared in epoch seconds), optionally also matching on equi ``keys``
    (e.g. a user id — the join shuffles on (keys, bin), so keyed band joins
    distribute by the key too). Left rows explode to bins {b-1, b, b+1}; right
    rows keep their single bin — a pair within the band always differs by ≤ 1
    bin and meets exactly once (at the RIGHT row's bin), so no dedup is needed.
    ``left_ts`` / ``right_ts`` must be distinct column names (alias upstream).

    INNER only, by construction: outer semantics cannot survive this rewrite —
    an unmatched left row would surface 3× (one per exploded bin, NULL right
    side) and the band post-filter (NULL for those rows) would then drop it
    entirely. An outer band join needs a post-join re-aggregation per original
    left row; until someone needs that, the parameter is not offered."""
    assert left_ts != right_ts, "alias the two timestamp columns apart"
    how = "inner"
    keys = keys or []
    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))
    l = left.withColumn(
        "_bin",
        F.explode(
            F.array(
                *[
                    (F.floor(l_epoch / F.lit(gap_s)) + F.lit(d)).cast("long")
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    r = right.withColumn("_bin", F.floor(r_epoch / F.lit(gap_s)).cast("long"))
    joined = l.join(r, [*keys, "_bin"], how)
    band = (
        F.abs(F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts)))
        <= F.lit(gap_s)
    )
    return joined.filter(band).drop("_bin")
