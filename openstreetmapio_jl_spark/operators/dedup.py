"""Deduplication operators for web-scale training-data pipelines.

All hashing is built from ``md5`` so every operator has an exact ANSI-SQL twin in
DuckDB (the driver's correctness oracle) and stays engine-portable — engine-native
``hash()``/``xxhash64()`` differ between Spark and DuckDB and would break the
differential check. Everything below is pure ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs anywhere.

Operators:
- exact dedup (normalized-text fingerprint groupBy),
- MinHash + LSH banding (shingle → H minhashes → B bands → bucket join),
- SimHash (32-bit, md5-prefix token hashes, per-bit majority vote),
- n-gram Jaccard similarity (shingle-join candidate pairs, exact Jaccard),
- embedding-cosine near-duplicates (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared primitives
# ---------------------------------------------------------------------------

def normalized_text(col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """md5 of normalized text — the exact-dup key."""
    return F.md5(F.encode(normalized_text(col), "UTF-8"))


def char_shingles(col: Column, n: int = 5) -> Column:
    """ARRAY<STRING> of overlapping character n-grams of the normalized text.

    Texts shorter than ``n`` yield an EMPTY array. The length gate is load-bearing:
    ``F.sequence(1, stop)`` with ``stop <= 0`` counts DOWN (``sequence(1,0) ==
    [1, 0]``), which would fabricate two truncated shingles for short docs and
    diverge from DuckDB's ``generate_series(1, 0)`` (empty)."""
    txt = normalized_text(col)
    return F.when(
        F.length(txt) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(txt) - (n - 1)),
            lambda i: F.substring(txt, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


# prime > 2^32 for Kirsch-Mitzenmacher double hashing: h_i(s) = (h1 + i*h2) mod P
MINHASH_PRIME = 4294967311


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def exact_duplicates(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (fp, n_docs, keep_id): one row per duplicate-group (n_docs >= 1), keeping
    the smallest id (deterministic survivor)."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def minhash_lsh_buckets(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """→ (band_idx, band_sig, n_docs, min_id, max_id) for buckets with >= 2 docs —
    the LSH candidate-duplicate groups. Bands are md5 over ``band_size``
    consecutive minhashes. At scale this is one explode + one groupBy shuffle keyed
    by (band_idx, band_sig); hot buckets (boilerplate text) are the skew case the
    salting helper handles."""
    assert num_hashes % band_size == 0
    nbands = num_hashes // band_size
    # Shingling explodes each doc ~|text| ways, so the stage's cost is sized by
    # its OUTPUT, not its input — if the input arrives in fewer partitions than
    # cores (one small parquet file, a coalesced upstream), the whole expansion
    # serializes. Rebalance by id first, but only when actually under-partitioned:
    # at real scale the corpus already has >= cores splits and no reshuffle happens.
    dp = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < dp:
        docs = docs.repartition(dp * 2, id_col)
    # Explode POSITIONS (an int sequence) and slice inside the same codegen stage
    # rather than exploding a materialized ARRAY<STRING> of n-grams: the string
    # array allocates |text| small strings per doc before the generate, which
    # measured ~6x slower than streaming substring-after-explode.
    # Length gate BEFORE the explode: sequence(1, stop<=0) counts DOWN in Spark
    # ([1, 0]), which would fabricate truncated shingles for sub-shingle-width
    # texts; filtering them here is also the documented drop-short-docs contract.
    txt = normalized_text(F.col(text_col))
    sh = (
        docs.select(F.col(id_col), txt.alias("t"))
        .filter(F.length("t") >= shingle_n)
        .select(
            id_col,
            "t",
            F.explode(
                F.sequence(F.lit(1), F.length("t") - (shingle_n - 1))
            ).alias("i"),
        )
        .select(id_col, F.substring(F.col("t"), F.col("i").cast("int"), shingle_n).alias("s"))
    )
    # ONE md5 per shingle (not one per shingle per hash function): the H minhash
    # families derive from the md5's two 32-bit halves via double hashing. Cuts
    # the dominant cost H-fold; the explode→groupBy aggregates map-side, so the
    # shuffle carries only H longs per document. Docs with no shingles (text
    # shorter than the shingle width) have no signature and are dropped — they
    # belong to the exact-dedup path.
    hashed = sh.select(
        id_col,
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(F.md5("s"), 9, 8), 16, 10).cast("long").alias("h2"),
    )
    sigs = hashed.groupBy(id_col).agg(
        *[
            F.min(
                F.pmod(F.col("h1") + F.lit(i + 1) * F.col("h2"), F.lit(MINHASH_PRIME))
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "_",
                                *[
                                    F.col(f"mh{b * band_size + j}").cast("string")
                                    for j in range(band_size)
                                ],
                            )
                        ).alias("band_sig"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_sig")
    return (
        bands.groupBy("band_idx", "band_sig")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def simhash(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """→ (id, simhash): 32-bit SimHash. Token hash = first 8 hex digits of md5 →
    BIGINT; bit j of the signature is the sign of sum over tokens of ±1 on that
    bit. Near-dups have small Hamming distance. All-JVM: explode + 32 conditional
    sums + bit recombination."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("tok"),
    ).withColumn("h", F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return votes.select(F.col(id_col), sig.alias("simhash"))


def _cap_bucket_df(
    memberships: DataFrame,
    keys: list[str],
    cap: int | None,
    sub_col: str | None = None,
) -> DataFrame:
    """Bound LSH/band bucket cardinality BEFORE the candidate self-join, by
    SUB-SPLITTING hot buckets on a finer deterministic signature instead of
    dropping them outright. Salting cannot fix a hot bucket — it spreads the
    rows but the O(n²) pair count inside the bucket survives; bounding the
    bucket is the only scale-safe move.

    Mechanics: buckets (grouped by ``keys``) holding ≤ ``cap`` members pass
    untouched (``_piece = ''``). Over-cap buckets split into pieces keyed by
    ``sub_col`` — a FINER signature the caller derives from the same sketch
    (double-width MinHash band, the neighboring SimHash band, extra
    hyperplanes): unrelated co-bucketed members (boilerplate shell around
    distinct content) scatter across pieces, while true near-duplicates — which
    agree on the finer signature with high probability — stay co-located and
    their pairs are RETAINED. Pieces still exceeding ``cap`` after the split
    (typically byte-identical clones, which no signature can separate) are
    dropped — the residual hard bound that keeps pair volume ≤ cap·|members|
    (documented recall trade; such groups belong to the exact-dedup path).

    Returns ``memberships`` with ``_piece`` appended — callers MUST include
    ``_piece`` in the candidate self-join keys (constant ``''`` when ``cap`` is
    None, so the join condition is uniform). Both groupBys key on the same
    columns the self-join shuffles on, so AQE folds the exchanges."""
    if cap is None:
        out = memberships.withColumn("_piece", F.lit(""))
        return out.drop(sub_col) if sub_col else out
    dfc = memberships.groupBy(*keys).agg(F.count("*").alias("_df"))
    m = memberships.join(dfc, keys)
    if sub_col is None:
        return (
            m.filter(F.col("_df") <= cap).drop("_df").withColumn("_piece", F.lit(""))
        )
    m = m.withColumn(
        "_piece",
        F.when(F.col("_df") <= cap, F.lit("")).otherwise(F.col(sub_col).cast("string")),
    ).drop("_df", sub_col)
    cold = (
        m.groupBy(*keys, "_piece")
        .agg(F.count("*").alias("_pdf"))
        .filter(F.col("_pdf") <= cap)
        .drop("_pdf")
    )
    return m.join(cold, [*keys, "_piece"])


def minhash_band_memberships(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """→ (id, band_idx, band_sig, sub_sig): one row per (doc, LSH band).

    ``band_sig`` is md5 over the band's ``band_size`` consecutive minhashes —
    the bucket key. ``sub_sig`` is md5 over the DOUBLE-width window starting at
    the same hash (wrapping): the finer signature the hot-bucket sub-split
    (:func:`_cap_bucket_df`) pieces over-cap buckets by — a pair with Jaccard s
    collides on it with probability s^(2·band_size) instead of s^band_size, so
    boilerplate-shell buckets scatter while true near-dups stay co-located.

    Shared by :func:`jaccard_via_lsh` (self-join corpus dedup) and the
    incremental path (:func:`build_dedup_index` persists exactly these rows)."""
    nbands = num_hashes // band_size
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    sh = d.select(
        "id",
        F.explode(F.array_distinct(char_shingles(F.col("text"), shingle_n))).alias("s"),
    )
    hashed = sh.select(
        "id",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(F.md5("s"), 9, 8), 16, 10).cast("long").alias("h2"),
    )
    sigs = hashed.groupBy("id").agg(
        *[
            F.min(
                F.pmod(F.col("h1") + F.lit(i + 1) * F.col("h2"), F.lit(MINHASH_PRIME))
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )

    def _sig(b: int, width: int) -> Column:
        return F.md5(
            F.concat_ws(
                "_",
                *[
                    F.col(f"mh{(b * band_size + j) % num_hashes}").cast("string")
                    for j in range(width)
                ],
            )
        )

    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        _sig(b, band_size).alias("band_sig"),
                        _sig(b, 2 * band_size).alias("sub_sig"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_sig", "band.sub_sig")


def jaccard_via_lsh(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.5,
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """→ (id_a, id_b, jaccard): the PLANET-SCALE composition the Jaccard
    operator's docstring prescribes — MinHash-LSH buckets generate the
    candidate pairs (sub-quadratic; only same-band-signature docs ever pair),
    then exact shingle-set Jaccard verifies each candidate. Versus
    :func:`ngram_jaccard_pairs` (whose shingle equi-join IS the prefilter),
    the candidate count here is bounded by bucket co-membership, not by
    shared-shingle document frequency — the property that survives 100 TB.
    Approximation is one-sided: every reported pair carries its EXACT Jaccard;
    pairs can only be MISSED (LSH recall), never wrongly scored.

    ``max_bucket_df`` bounds bucket cardinality before the self-join: over-cap
    buckets SUB-SPLIT on the double-width band signature (true near-dups stay
    co-located; unrelated boilerplate-shell members scatter), with a residual
    hard drop for pieces no signature can separate (byte-identical clones) —
    see :func:`_cap_bucket_df`. Without the guard one degenerate bucket
    produces O(n²) pairs at corpus scale."""
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    # per-doc band memberships (same derivation as minhash_lsh_buckets, which
    # returns bucket AGGREGATES — here the memberships themselves are needed)
    bands = minhash_band_memberships(
        docs,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        band_size=band_size,
    )
    bands = _cap_bucket_df(
        bands, ["band_idx", "band_sig"], max_bucket_df, sub_col="sub_sig"
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a._piece") == F.col("b._piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact verify: shingle sets re-attached per candidate pair only
    shs = d.select(
        "id", F.array_distinct(char_shingles(F.col("text"), shingle_n)).alias("sh")
    )
    sa = shs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = shs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 32,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """→ (id_a, id_b, hamming) for pairs with SimHash Hamming distance ≤
    ``max_hamming`` (id_a < id_b).

    Candidate generation by the pigeonhole banding trick: the ``bits``-bit
    signature splits into ``max_hamming + 1`` bands — two signatures within
    distance ``max_hamming`` MUST agree exactly on at least one band, so
    candidates are the union of per-band equi-join buckets (never all-pairs).
    Exact verify = ``bit_count(xor)`` on the full signature; a pair matching in
    several bands is deduped by grouping before the verify.

    ``max_bucket_df`` bounds band-bucket cardinality before the self-join —
    the boilerplate-text hot bucket otherwise goes quadratic, and salting
    can't help (it spreads rows, not the pair count). Over-cap buckets
    SUB-SPLIT on the NEXT band's value (:func:`_cap_bucket_df`): a retained
    hot-bucket pair must then agree on two adjacent bands (≥ 2·band_bits
    matching bits) — diverse hot buckets scatter, near-identical pairs stay;
    pieces still over cap (identical signatures) are dropped."""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    sig = simhash(docs, id_col=id_col, text_col=text_col, bits=bits).select(
        F.col(id_col).alias("id"), "simhash"
    )

    def _band_val(b: int) -> Column:
        return F.shiftright(F.col("simhash"), (b % n_bands) * band_bits).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    bands = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        _band_val(b).alias("band_val"),
                        _band_val(b + 1).cast("string").alias("sub_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "simhash", "band.band_idx", "band.band_val", "band.sub_val")
    bands = _cap_bucket_df(
        bands, ["band_idx", "band_val"], max_bucket_df, sub_col="sub_val"
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._piece") == F.col("b._piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .agg(
            F.first("a.simhash").alias("sig_a"),
            F.first("b.simhash").alias("sig_b"),
        )
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """→ (id_a, id_b, jaccard) for pairs above threshold (id_a < id_b).

    Candidate generation by shingle equi-join (docs sharing no shingle never
    pair), exact Jaccard = |∩| / (|A| + |B| − |∩|). At planet scale the shingle
    join is preceded by LSH pre-filtering; here the shingle join IS the
    pre-filter.

    ``max_shingle_df`` is the hot-shingle guard: shingles appearing in more than
    that many documents (site boilerplate, navigation chrome) are dropped from
    the shingle SETS — they generate O(df²) candidate-pair blowup in the
    self-join while carrying no discriminative signal. Jaccard is then computed
    over the filtered sets (a documented stopword-shingle semantics, applied
    identically in the DuckDB oracle). ``None`` disables the guard."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(char_shingles(F.col(text_col), shingle_n))).alias("s"),
    )
    if max_shingle_df is not None:
        # One extra groupBy on the shingle key; the join back is on the same key
        # so with AQE it plans as a co-partitioned (or broadcast, when the cold
        # set is small) join with no additional shuffle of the big side.
        cold = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("s")
        )
        sh = sh.join(cold, "s")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duplicate_clusters(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket_df: int | None = None,
    handles: list | None = None,
) -> DataFrame:
    """→ (canonical_id, n_docs, max_id): one row per near-duplicate CLUSTER —
    the survivor-selection step a corpus pipeline runs after pair generation
    ("keep one doc per cluster, drop the rest"). Composition:
    :func:`jaccard_via_lsh` pairs → :func:`operators.graph.connected_components`
    → per-component aggregate. ``canonical_id`` is the minimum doc id in the
    cluster (deterministic survivor, same convention as
    :func:`exact_duplicates`'s keep_id); clusters are always n_docs >= 2
    (singletons by definition never appear in the pair graph).

    Transitivity is deliberate: near-duplication is NOT transitive, so a
    cluster may span pairs whose mutual Jaccard is below threshold (A~B, B~C,
    A≁C still clusters {A,B,C}). That is the standard corpus-dedup semantics —
    dropping all-but-one of a chained cluster — and the reason the cluster step
    exists instead of dropping pairwise."""
    from openstreetmapio_jl_spark.operators.graph import connected_components

    pairs = jaccard_via_lsh(
        docs,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        max_bucket_df=max_bucket_df,
    )
    comp = connected_components(pairs, src="id_a", dst="id_b", handles=handles)
    return comp.groupBy(F.col("component").alias("canonical_id")).agg(
        F.count("*").alias("n_docs"), F.max("id").alias("max_id")
    )
