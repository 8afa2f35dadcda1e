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
    how: str = "inner",
    left_id: str | None = None,
    validate_left_id: bool = False,
) -> DataFrame:
    """Pairs (l, r) with ``|l.<left_ts> - r.<right_ts>| <= gap_s`` (timestamps
    compared in epoch seconds), optionally also matching on equi ``keys``
    (e.g. a user id — the join shuffles on (keys, bin), so keyed band joins
    distribute by the key too). Left rows explode to bins {b-1, b, b+1}; right
    rows keep their single bin — a pair within the band always differs by ≤ 1
    bin and meets exactly once (at the RIGHT row's bin), so no dedup is needed.
    ``left_ts`` / ``right_ts`` must be distinct column names (alias upstream).

    ``how="left"`` adds unmatched left rows with NULL right columns. Outer
    semantics cannot ride the binned join directly — an unmatched left row
    would surface 3× (one per exploded bin) and the band post-filter would
    then drop all three — so the left-outer form is the documented
    re-aggregation: the inner result plus a ``left_anti`` of the original left
    frame against the matched ``left_id`` set (a per-original-left-row
    re-aggregation, costing one extra scan of the left side). ``left_id`` must
    name a UNIQUE, NON-NULL key of ``left`` (an event id, a URL) — uniqueness
    and non-nullness are the caller's contract, exactly as for any keyed outer
    join: a NULL ``left_id`` never equals any anti-join key, so a NULL-id left
    row that matched in the inner arm would ALSO surface in the unmatched arm
    (emitted twice). Pass ``validate_left_id=True`` to enforce the contract
    with one extra column-pruned pass over ``left`` (raises on NULL ids);
    default off so the hot path stays action-free."""
    assert left_ts != right_ts, "alias the two timestamp columns apart"
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left":
        if left_id is None:
            raise ValueError("how='left' requires left_id (a unique key of left)")
        if validate_left_id:
            n_null = left.filter(F.col(left_id).isNull()).limit(1).count()
            if n_null:
                raise ValueError(
                    f"band_join(how='left'): left has NULL {left_id!r} rows — "
                    "the outer re-aggregation would emit matched NULL-id rows "
                    "twice; filter them or use a non-null key"
                )
        inner = band_join(
            left,
            right,
            left_ts=left_ts,
            right_ts=right_ts,
            gap_s=gap_s,
            keys=keys,
            how="inner",
        )
        unmatched = left.join(
            inner.select(left_id).distinct(), left_id, "left_anti"
        )
        return inner.unionByName(unmatched, allowMissingColumns=True)
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of join: every left row picks up ``value_cols`` from the
    LATEST right row with the same ``keys`` and ``right.<right_ts> <=
    left.<left_ts>`` (inclusive — pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics); unmatched left rows keep NULLs (left-outer). With
    ``tolerance_s``, matches older than the tolerance are nulled out.

    NOT a join underneath: the scalable shape is union-the-sides + one
    per-key ordered window with ``last(value, ignorenulls=True)`` over the
    unbounded-preceding frame — ONE shuffle on ``keys``, no candidate
    explosion, no O(|L|·|R|) nested loop (what Spark plans for the naive
    ``max(right_ts) <= left_ts`` correlated form). Right rows sort BEFORE
    left rows at equal timestamps, which is exactly the inclusive bound.

    Contract: ``right`` must be unique per (keys, right_ts) — duplicate
    right timestamps within a key make which duplicate wins
    order-dependent; dedupe upstream (e.g. keep the max-id row per (key,
    ts)). ``left_ts``/``right_ts`` may be the same name; value columns must
    not collide with left columns (alias upstream). All ``value_cols`` come
    from the SINGLE matched row (carried as one struct through one window
    expression), so a NULL value in the matched row stays NULL rather than
    falling back to an older row.
    """
    from pyspark.sql import Window

    for c in value_cols:
        if c in left.columns:
            raise ValueError(f"value column {c!r} collides with a left column")
    for k in keys:
        # unionByName(allowMissingColumns) would silently fill a key absent
        # from one side with NULLs -> all left rows land in the NULL
        # partition and every value comes back NULL with no error
        if k not in left.columns:
            raise ValueError(f"key {k!r} is not a column of left")
        if k not in right.columns:
            raise ValueError(f"key {k!r} is not a column of right")
    # merge_asof / DuckDB ASOF never match on NULLs: a NULL right timestamp
    # sorts FIRST ascending (inside EVERY left row's frame — it would "match"
    # any left row with no real prior row), and a NULL key would meet
    # NULL-keyed LEFT rows in the NULL window partition even though NULL =
    # NULL is never true in a join. Drop both from the right side; NULL-keyed
    # left rows then simply stay unmatched (left-outer), same as the oracle.
    not_null = F.col("_ats").isNotNull()
    for k in keys:
        not_null = not_null & F.col(k).isNotNull()
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *value_cols,
    ).filter(not_null)
    l = left.select(
        "*", F.col(left_ts).alias("_ats"), F.lit(1).alias("_side")
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pick the matched right ROW atomically (one struct through one window
    # expression): per-column last(ignorenulls) would skip a legitimately-
    # NULL value and splice in an OLDER row's value for that column only
    mrow = F.last(
        F.when(
            F.col("_side") == 0,
            F.struct(F.col("_ats").alias("_mts"), *value_cols),
        ),
        ignorenulls=True,
    ).over(w)
    if tolerance_s is None:
        in_tol = F.lit(True)
    elif dict(u.dtypes)["_ats"].startswith("timestamp"):
        # timestamp/timestamp_ntz subtraction yields a day-time interval
        # (neither casts to double in Spark 4's ANSI type system)
        in_tol = (F.col("_ats") - mrow["_mts"]) <= F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0), F.lit(float(tolerance_s))
        )
    else:  # numeric epoch columns
        in_tol = (F.col("_ats") - mrow["_mts"]) <= F.lit(float(tolerance_s))
    filled = u.select(
        "*",
        *[F.when(in_tol, mrow[c]).alias(f"_v_{c}") for c in value_cols],
    )
    out = filled.filter(F.col("_side") == 1)
    for c in value_cols:
        out = out.drop(c).withColumnRenamed(f"_v_{c}", c)
    return out.drop("_ats", "_side")
