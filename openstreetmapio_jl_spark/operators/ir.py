"""Keyword extraction: TF-IDF / BM25 characteristic terms per document.

The IR pillar of the text stack: dedup asks "which documents repeat each
other", decontamination asks "which documents repeat the benchmark" — this
asks "which terms MAKE each document what it is". Training-data pipelines use
exactly this aggregate for topic bucketing, corpus balancing, and
keyword-conditioned sampling, and it is the same (tf, df, N) statistics table
an inverted-index build materializes.

Shape at scale (the whole point): one explode of term POSITIONS per document
(never a materialized HOF array — see ``contamination_stats`` for the codegen
re-derivation pathology), a map-side-combined ``groupBy(doc, term)`` for tf,
one ``groupBy(term)`` over the already-distinct (doc, term) frame for df (a
COUNT, not a count-distinct — the heavy distinct already happened in the tf
aggregate), corpus totals as a single-row broadcast crossJoin (never a
driver-side collect), and one per-document window for the top-k. Three
shuffles total — tf (doc,term), df (term, re-joined while still co-partitioned
on term), top-k (doc) — each on the natural key of its stage; no Python
anywhere.

Scoring formulas (both classic, both pure arithmetic over the aggregates, so
a DuckDB oracle mirrors them exactly):

- ``tfidf``: smoothed sklearn-style ``tf * (ln((N + 1) / (df + 1)) + 1)`` —
  the +1s keep corpus-wide terms positive and division total.
- ``bm25``: Robertson/Okapi ``idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
  with ``idf = ln(1 + (N − df + 0.5) / (df + 0.5))`` — saturating tf and
  length-normalizing by the corpus mean document length (two more columns on
  the same aggregates; the pipeline is IDENTICAL to tfidf's, only the final
  scoring expression differs).

The reference repo has no IR surface; this generalizes its tag-driven
element scoring (the "which tags matter" heuristics in
``/root/reference/src/load_pbf.jl`` callbacks) to statistical term weighting
over the web-pages corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ir_tokens(col: Column) -> Column:
    """ARRAY<STRING> of lowercase alphanumeric tokens — the IR tokenizer
    (punctuation-stripping, unlike the whitespace tokenizer dedup uses: "the
    cat." and "the cat" must agree on the term "cat"). Same class as
    ``er.name_tokens``; empty tokens filtered."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def ranked_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    scoring: str = "tfidf",
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int | None = None,
) -> DataFrame:
    """→ ``(id, pos, term, score)``: the ``top_k`` highest-scoring terms per
    document under ``scoring`` ("tfidf" or "bm25"). ``pos`` is the 1-based
    rank; ties break on the term string ascending so the result is fully
    deterministic. Documents with no tokens produce no rows (there is nothing
    to rank). ``docs`` rows must be unique by ``id_col`` (corpus tables are;
    N and avgdl are computed over rows).

    With ``round_dp`` set, the score is rounded to that many decimals and
    CAST TO DECIMAL **before** the ranking window, so an independent engine
    running the same formula sorts bit-identical keys (the registry/oracle
    framing — equal (tf, df, dl) inputs give equal doubles per engine, and
    rounding collapses cross-engine ulp noise before it can reorder
    near-ties); with ``round_dp=None`` the raw double ranks and is returned
    (the library default)."""
    if scoring not in ("tfidf", "bm25"):
        raise ValueError(f"unknown scoring {scoring!r}")
    toks = docs.select(
        F.col(id_col).alias("id"), ir_tokens(F.col(text_col)).alias("toks")
    )
    # corpus totals: ONE row, broadcast — N docs and mean token count (BM25's
    # length normalizer). Computed over all docs incl. empty ones: an empty
    # doc is still a (very short) document of the corpus.
    totals = toks.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    # explode POSITIONS, index into the array — the generator child stays a
    # plain attribute, so codegen derives the token array once per row. The
    # size>0 guard matters: sequence(0, size-1) on an EMPTY array is
    # sequence(0, -1), which Spark evaluates as the DESCENDING [0, -1] (step
    # defaults to -1 when start > stop) — two out-of-bounds lookups yielding
    # NULL terms instead of the documented "no rows".
    terms = (
        toks.filter(F.size("toks") > 0)
        .select(
            "id",
            F.size("toks").alias("dl"),
            F.explode(F.sequence(F.lit(0), F.size("toks") - 1)).alias("i"),
            F.col("toks"),
        )
        .select("id", "dl", F.col("toks")[F.col("i")].alias("term"))
    )
    tf = terms.groupBy("id", "term").agg(
        F.count("*").alias("tf"), F.min("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(totals))
    if scoring == "tfidf":
        score = F.col("tf") * (
            F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
        )
    else:
        idf = F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        score = idf * (
            F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            )
        )
    if round_dp is not None:
        score = F.round(score, round_dp).cast(f"decimal(18,{round_dp})")
    w = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.select("id", "term", score.alias("score"))
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .filter(F.col("pos") <= top_k)
        .select("id", "pos", "term", "score")
    )
