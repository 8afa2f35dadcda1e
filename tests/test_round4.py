"""Round-4 additions: hot-bucket SUB-SPLIT (capped LSH buckets retain true
duplicates instead of being dropped wholesale), incremental dedup against a
persisted signature index, and large-star/small-star connected components.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.operators import dedup, similarity


# ---------------------------------------------------------------------------
# hot-bucket sub-split
# ---------------------------------------------------------------------------

def test_cap_bucket_df_subsplit_mechanics(spark):
    """Unit contract of _cap_bucket_df with a sub-split column: cold buckets
    pass whole (piece ''), hot buckets split by sub_col keeping pieces <= cap,
    residual over-cap pieces drop."""
    rows = []
    # cold bucket: 3 members, sub keys irrelevant
    rows += [(f"c{i}", "cold", f"s{i}") for i in range(3)]
    # hot bucket: 120 members; twins t0/t1 share sub key "X", 118 others have
    # unique sub keys; plus one over-cap piece: 60 clones sharing sub key "Y"
    rows += [("t0", "hot", "X"), ("t1", "hot", "X")]
    rows += [(f"d{i}", "hot", f"u{i}") for i in range(58)]
    rows += [(f"y{i}", "hot", "Y") for i in range(60)]
    m = spark.createDataFrame(rows, "id string, bkt string, sub string")
    out = dedup._cap_bucket_df(m, ["bkt"], 50, sub_col="sub").collect()
    by_id = {r.id: r._piece for r in out}
    # cold bucket intact, constant piece
    assert all(by_id[f"c{i}"] == "" for i in range(3))
    # twins retained, co-located in the same piece
    assert by_id.get("t0") == "X" and by_id.get("t1") == "X"
    # unique-sub members retained in singleton pieces
    assert all(by_id[f"d{i}"] == f"u{i}" for i in range(58))
    # the 60-clone piece exceeds the cap even after the split -> dropped
    assert not any(i.startswith("y") for i in by_id)
    # every surviving (bkt, piece) group is within the cap
    sizes = {}
    for r in out:
        sizes[(r.bkt, r._piece)] = sizes.get((r.bkt, r._piece), 0) + 1
    assert max(sizes.values()) <= 50


@pytest.fixture(scope="module")
def diverse_hot_docs(spark):
    """400 docs sharing a boilerplate shell with diverse random tails (their
    modal band buckets exceed the cap) + planted near-identical twins whose
    band-2 bucket IS one of the hot buckets."""
    import random

    random.seed(11)
    BOILER = (
        "breaking news subscribe to our newsletter all rights reserved "
        "cookie policy terms of service contact us about advertising "
    )
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform "
        "victor whiskey xray yankee zulu"
    ).split()
    rows = []
    for i in range(400):
        tail = " ".join(
            random.choice(words) + str(random.randint(0, 999)) for _ in range(12)
        )
        rows.append((i, BOILER + tail))
    rows.append((1000, BOILER + "unique payload alpha zebra quartz"))
    rows.append((1001, BOILER + "unique payload alpha zebra quartzx"))
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_subsplit_retains_planted_pair_inside_hot_bucket(diverse_hot_docs):
    """The round-3 recall hole, closed: a true near-dup pair living inside an
    over-cap bucket survives the cap because the double-width band signature
    sub-splits the bucket instead of dropping it."""
    m = dedup.minhash_band_memberships(diverse_hot_docs)
    sizes = m.groupBy("band_idx", "band_sig").count()
    planted_buckets = (
        m.filter(F.col("id").isin(1000, 1001))
        .join(sizes, ["band_idx", "band_sig"])
        .collect()
    )
    # precondition: the twins DO sit in at least one over-cap bucket, so the
    # hot path (not the cold path) is what must retain them
    assert any(r["count"] > 50 for r in planted_buckets), planted_buckets

    pairs = dedup.jaccard_via_lsh(diverse_hot_docs, threshold=0.5, max_bucket_df=50)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1000, 1001) in found
    # ...while pair volume stays bounded: the 400 diverse boilerplate docs are
    # below-threshold and must not explode into a quasi-quadratic pair set
    assert len(found) <= 10


def test_subsplit_residual_cap_still_bounds_identical_clones(spark):
    """Byte-identical clones share EVERY finer signature — no sub-split can
    separate them, so the residual hard cap drops the piece (they belong to
    exact dedup). Pair volume stays linear; the cold pair is untouched."""
    BOILER = (
        "breaking news subscribe to our newsletter all rights reserved "
        "cookie policy terms of service contact us about advertising "
    )
    rows = [(i, BOILER) for i in range(200)]
    rows += [(1000, "an entirely unique survey of alpine butterflies in spring")]
    rows += [(1001, "an entirely unique survey of alpine butterflies in summer")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.jaccard_via_lsh(docs, threshold=0.5, max_bucket_df=50)
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(1000, 1001)}


def test_simhash_subsplit_residual_cap_and_twins(spark):
    """SimHash hot buckets sub-split on the NEXT band's value: hamming-0/1
    twins (agreeing on every band) survive; 200 identical clones — identical
    on the sub band too — still drop via the residual cap."""
    BOILER = "all rights reserved cookie policy terms of service " * 3
    rows = [(i, BOILER) for i in range(200)]
    # long shared text + one changed word => small hamming distance (short
    # texts give every token a big vote share and scatter the signature)
    rows += [
        (1000, "an entirely unique survey of alpine butterfly migration routes in spring"),
        (1001, "an entirely unique survey of alpine butterfly migration routes in summer"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.simhash_neardup_pairs(docs, max_bucket_df=50)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1000, 1001) in found
    assert all(a >= 1000 for a, _ in found)


def test_embedding_subsplit_retains_parallel_pair_in_hot_bucket(spark):
    """Embedding hot buckets sub-split on 4 extra hyperplanes: a genuinely
    near-parallel pair inside an over-cap sign-pattern bucket survives; the
    bucket's diverse members scatter across sub-pieces. Construction: 80
    vectors = base + noise confined to the orthogonal complement of BOTH
    tables' bucket planes — bucket signatures equal base's EXACTLY (so the
    bucket is provably hot in every table) while the generic sub planes see
    the noise and scatter the members."""
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    bucket_planes = np.vstack(
        [similarity.hyperplanes(64, 8, seed=42 + t) for t in range(2)]
    )  # 16 x 64
    # orthonormal basis of the 48-dim complement of the bucket-plane span
    _, _, vt = np.linalg.svd(bucket_planes)
    comp = vt[16:]  # rows orthogonal to every bucket plane
    rows = []
    for i in range(80):
        w = comp.T @ rng.standard_normal(48)
        rows.append((i, (base + 5.0 * w).tolist()))
    t = base / np.linalg.norm(base)
    rows.append((1000, t.tolist()))
    rows.append((1001, (t * 1.001).tolist()))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = similarity.embedding_near_duplicates(
        vecs, threshold=0.99, max_bucket_df=50
    )
    found = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1000, 1001) in found
    # cone members have mutual cos ~ |base|^2 / |v|^2 << 0.99; volume bounded
    assert len(found) <= 5


# ---------------------------------------------------------------------------
# incremental dedup against a persisted signature index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def split_corpus(spark):
    """Synthetic corpus/batch split with duplicate structure spanning the
    split: near-dup groups (some corpus-only, some cross-split), a clone
    group whose UNION size exceeds the bucket cap only when corpus+batch are
    counted together (30 + 30 vs cap 50), and unique filler."""
    import random

    random.seed(23)
    words = (
        "meridian harbor lantern velvet orchard thistle quarry ember sable "
        "juniper gossamer raven tundra mosaic zephyr cobalt prairie saffron"
    ).split()

    def sentence(n=14):
        return " ".join(random.choice(words) + str(random.randint(0, 99)) for _ in range(n))

    corpus_rows, batch_rows = [], []
    nid = iter(range(100_000))
    # 12 near-dup groups of 4 (two members in corpus, two in batch)
    for g in range(12):
        base = sentence()
        for k in range(4):
            doc = (next(nid), base + f" tail{k}")
            (corpus_rows if k < 2 else batch_rows).append(doc)
    # clone group split 30/30 — union (60) exceeds cap 50, each side alone doesn't
    clone = "all rights reserved cookie policy subscribe newsletter " * 3
    for k in range(60):
        (corpus_rows if k < 30 else batch_rows).append((next(nid), clone))
    # unique filler on both sides
    for k in range(150):
        corpus_rows.append((next(nid), sentence()))
    for k in range(40):
        batch_rows.append((next(nid), sentence()))
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string").persist()
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string").persist()
    dedup.build_dedup_index(spark, corpus, table_prefix="t4_idx", n_buckets=4)
    return corpus, batch


@pytest.mark.parametrize("cap", [None, 50])
def test_incremental_equals_full_recompute_restricted(spark, split_corpus, cap):
    """incremental_dedup_pairs == jaccard_via_lsh(corpus ∪ batch) restricted
    to pairs touching the batch — including hot-bucket cap semantics computed
    over the UNION (the 30/30 clone group must drop at cap 50 even though
    neither side alone exceeds it)."""
    corpus, batch = split_corpus
    inc = dedup.incremental_dedup_pairs(
        spark, batch, table_prefix="t4_idx", threshold=0.5, max_bucket_df=cap
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in inc.collect()}

    full = dedup.jaccard_via_lsh(
        corpus.unionByName(batch), threshold=0.5, max_bucket_df=cap
    )
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in full.collect()
        if r.id_a in batch_ids or r.id_b in batch_ids
    }
    assert got == want
    assert len(got) > 0  # the cross-split near-dup groups must surface
    if cap == 50:
        # union-cap semantics: no clone-group pairs (ids 48..107 are clones)
        clone_ids = set(range(48, 108))
        assert not any(a in clone_ids or b in clone_ids for a, b in got)
    else:
        clone_ids = set(range(48, 108))
        assert any(a in clone_ids for a, b in got)  # uncapped: clones pair up


def test_incremental_index_side_has_no_exchange(spark, split_corpus):
    """Scale guard: the persisted memberships table must reach its first join
    without ANY Exchange above its scan — every batch-derived frame joins onto
    it via broadcast, so the index (corpus-sized at 100 TB) never shuffles."""
    import re

    _, batch = split_corpus
    df = dedup.incremental_candidate_pairs(
        spark, batch, table_prefix="t4_idx", max_bucket_df=50
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    lines = plan.splitlines()

    def depth(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        return m.start() if m else -1

    scan_lines = [
        i for i, l in enumerate(lines)
        if "t4_idx_memberships" in l and ("Scan" in l or "FileScan" in l)
    ]
    assert scan_lines, "memberships scan missing from plan:\n" + plan
    for idx in scan_lines:
        d = depth(lines[idx])
        ancestors = []
        for j in range(idx - 1, -1, -1):
            dj = depth(lines[j])
            if dj < d:
                ancestors.append(lines[j])
                d = dj
                if "Join" in lines[j]:
                    break
        chain = "\n".join(reversed(ancestors))
        assert any("Join" in a for a in ancestors), chain
        assert not any("Exchange" in a for a in ancestors), (
            "index memberships shuffled before first join:\n" + chain
        )
        assert "BroadcastHashJoin" in ancestors[-1] or "BroadcastNestedLoopJoin" in ancestors[-1], chain


# ---------------------------------------------------------------------------
# large-star/small-star connected components
# ---------------------------------------------------------------------------

def test_two_phase_cc_converges_on_long_chain_in_log_rounds(spark):
    """The adversarial input for min-label propagation (O(diameter) rounds): a
    1,000-vertex path. The two-phase large-star/small-star variant must
    converge within ~log2(n)+detection rounds (16 >> log2(1000)=10, while
    propagation would need 999) with every vertex labeled by the minimum."""
    import warnings

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    from openstreetmapio_jl_spark.operators.graph import connected_components

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        labels = connected_components(edges, max_iter=16, algorithm="two-phase")
        rows = labels.collect()
    assert not [x for x in w if x.category is RuntimeWarning], [
        str(x.message) for x in w
    ]
    assert len(rows) == 1000
    assert all(r.component == 0 for r in rows)


def test_two_phase_cc_matches_propagation_labels(spark):
    """Same labels as the propagation path on a mixed graph (two cliques, a
    bridge, a cycle, a chain) — the algorithms are interchangeable."""
    import random

    from openstreetmapio_jl_spark.operators.graph import connected_components

    random.seed(9)
    e = []
    # clique 0-4 and clique 10-14, bridged
    for a in range(5):
        for b in range(a + 1, 5):
            e.append((a, b))
            e.append((10 + a, 10 + b))
    e.append((4, 10))
    # cycle 20..27
    e += [(20 + i, 20 + (i + 1) % 8) for i in range(8)]
    # chain 40..60
    e += [(i, i + 1) for i in range(40, 60)]
    # random extra edges inside 100..140
    e += [
        (random.randint(100, 140), random.randint(100, 140)) for _ in range(60)
    ]
    edges = spark.createDataFrame(e, "id_a long, id_b long")
    prop = {
        (r.id, r.component)
        for r in connected_components(edges, max_iter=40).collect()
    }
    two = {
        (r.id, r.component)
        for r in connected_components(
            edges, max_iter=20, algorithm="two-phase"
        ).collect()
    }
    assert prop == two


def test_two_phase_cc_through_duplicate_clusters(spark):
    """duplicate_clusters with the two-phase CC wired through `handles` storage
    management still yields the chain-transitive clusters."""
    from openstreetmapio_jl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 7)], "id_a long, id_b long"
    )
    handles = []
    labels = connected_components(
        edges, max_iter=10, handles=handles, algorithm="two-phase"
    )
    got = {(r.id, r.component) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}
    assert handles  # checkpoint storage was tracked for release
    for h in handles:
        h.unpersist()


# ---------------------------------------------------------------------------
# left-outer band join
# ---------------------------------------------------------------------------

def test_band_join_left_outer_semantics(spark):
    """how='left': matched pairs identical to inner; unmatched left rows
    surface exactly ONCE with NULL right columns (not 3x via the exploded
    bins, not dropped by the band post-filter)."""
    from openstreetmapio_jl_spark.operators import temporal

    left = spark.createDataFrame(
        [
            ("a", "u1", "2024-01-01 10:00:00"),
            ("b", "u1", "2024-01-01 12:00:00"),  # no click within 600 s
            ("c", "u2", "2024-01-01 10:00:30"),
            ("d", "u3", "2024-01-01 10:00:00"),  # user with no clicks at all
        ],
        "lid string, user_id string, p_ts string",
    ).withColumn("p_ts", F.to_timestamp("p_ts"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:05:00"),
            ("u1", "2024-01-01 09:55:00"),
            ("u2", "2024-01-01 10:10:00"),
            ("u2", "2024-01-01 11:00:00"),
        ],
        "user_id string, c_ts string",
    ).withColumn("c_ts", F.to_timestamp("c_ts"))

    out = temporal.band_join(
        left, right, left_ts="p_ts", right_ts="c_ts", gap_s=600,
        keys=["user_id"], how="left", left_id="lid",
    ).collect()
    by_lid: dict = {}
    for r in out:
        by_lid.setdefault(r.lid, []).append(r.c_ts)
    assert len(by_lid["a"]) == 2 and all(v is not None for v in by_lid["a"])
    assert by_lid["b"] == [None]  # unmatched: exactly once, NULL right side
    assert len(by_lid["c"]) == 1 and by_lid["c"][0] is not None
    assert by_lid["d"] == [None]

    with pytest.raises(ValueError, match="left_id"):
        temporal.band_join(
            left, right, left_ts="p_ts", right_ts="c_ts", gap_s=600, how="left"
        )
    with pytest.raises(ValueError, match="how"):
        temporal.band_join(
            left, right, left_ts="p_ts", right_ts="c_ts", gap_s=600, how="full"
        )


# ---------------------------------------------------------------------------
# lz4/zstd codec seams (pbf/blocks.py:decompress_blob import-gated arms)
# ---------------------------------------------------------------------------

def _has_lz4() -> bool:
    try:
        import lz4.frame  # noqa: F401

        return True
    except ImportError:
        return False


def _has_zstd() -> bool:
    try:
        import zstandard  # noqa: F401

        return True
    except ImportError:
        return False


def _blob_with_arm(field_no: int, payload: bytes, raw_size: int) -> bytes:
    from openstreetmapio_jl_spark.pbf import blocks, proto

    return proto.field_varint(blocks._F_RAW_SIZE, raw_size) + proto.field_bytes(
        field_no, payload
    )


def test_lz4_zstd_arms_error_cleanly_without_wheels():
    """Always-run: an lz4/zstd-compressed blob in a sandbox without the wheel
    must raise a NAMED ValueError (the reference ships CodecLz4/CodecZstd as
    hard deps — Project.toml — so a zstd planet file decodes there; here the
    semantics are implemented and only the wheel is absent). Skipped-green if
    the wheels ARE present (the round-trip tests below take over)."""
    from openstreetmapio_jl_spark.pbf import blocks

    if not _has_lz4():
        with pytest.raises(ValueError, match="lz4.*unavailable"):
            blocks.decompress_blob(_blob_with_arm(blocks._F_LZ4, b"xx", 2))
    if not _has_zstd():
        with pytest.raises(ValueError, match="zstd.*unavailable"):
            blocks.decompress_blob(_blob_with_arm(blocks._F_ZSTD, b"xx", 2))


@pytest.mark.skipif(
    not _has_lz4(),
    reason="lz4 wheel not installed in this sandbox: the _F_LZ4 arm of "
    "pbf/blocks.py:decompress_blob is the integration seam left unexercised — "
    "install `lz4` and this test round-trips a frame-compressed payload "
    "through the exact decode dispatch the reference's CodecLz4 path covers",
)
def test_lz4_blob_roundtrip():
    import lz4.frame

    from openstreetmapio_jl_spark.pbf import blocks

    payload = b"osm block payload " * 100
    blob = _blob_with_arm(blocks._F_LZ4, lz4.frame.compress(payload), len(payload))
    assert blocks.decompress_blob(blob) == payload


@pytest.mark.skipif(
    not _has_zstd(),
    reason="zstandard wheel not installed in this sandbox: the _F_ZSTD arm of "
    "pbf/blocks.py:decompress_blob is the integration seam left unexercised — "
    "install `zstandard` and this test round-trips a compressed payload "
    "through the exact decode dispatch the reference's CodecZstd path covers",
)
def test_zstd_blob_roundtrip():
    import zstandard

    from openstreetmapio_jl_spark.pbf import blocks

    payload = b"osm block payload " * 100
    blob = _blob_with_arm(
        blocks._F_ZSTD, zstandard.ZstdCompressor().compress(payload), len(payload)
    )
    assert blocks.decompress_blob(blob) == payload


def test_extend_dedup_index_two_batch_ingest_loop(spark, split_corpus):
    """The continuous-ingest loop: dedup batch1 vs index, EXTEND the index
    with batch1, then batch2's incremental pairs equal full recompute over
    corpus ∪ batch1 ∪ batch2 restricted to batch2-touching pairs."""
    corpus, batch = split_corpus
    # fresh index (the module fixture's t4_idx is shared; use a private prefix)
    dedup.build_dedup_index(spark, corpus, table_prefix="t4_ext", n_buckets=4)
    dedup.extend_dedup_index(spark, batch, table_prefix="t4_ext", n_buckets=4)
    # batch2: near-dups of both corpus docs and batch-1 docs + fresh filler
    b1 = {r.doc_id: r.text for r in batch.limit(3).collect()}
    c1 = {r.doc_id: r.text for r in corpus.limit(2).collect()}
    rows = [(200_000 + i, t + " drift") for i, t in enumerate(b1.values())]
    rows += [(210_000 + i, t + " drift") for i, t in enumerate(c1.values())]
    rows += [(220_000 + i, f"completely fresh doc number {i} with words") for i in range(5)]
    batch2 = spark.createDataFrame(rows, "doc_id long, text string")

    inc = dedup.incremental_dedup_pairs(
        spark, batch2, table_prefix="t4_ext", threshold=0.5, max_bucket_df=50
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in inc.collect()}

    everything = corpus.unionByName(batch).unionByName(batch2)
    full = dedup.jaccard_via_lsh(everything, threshold=0.5, max_bucket_df=50)
    b2_ids = {r.doc_id for r in batch2.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in full.collect()
        if r.id_a in b2_ids or r.id_b in b2_ids
    }
    assert got == want and len(got) > 0
    # r5 O(batch) stats maintenance: per-batch partitions summed must equal a
    # ground-truth recount of the memberships table (corpus partition
    # '__base__' + one partition per extension)
    summed = {
        (r.band_idx, r.band_sig, r.sub_sig): r.total
        for r in spark.table("t4_ext_bucket_stats")
        .groupBy("band_idx", "band_sig", "sub_sig")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    }
    truth = {
        (r.band_idx, r.band_sig, r.sub_sig): r.cnt
        for r in spark.table("t4_ext_memberships")
        .groupBy("band_idx", "band_sig", "sub_sig")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert summed == truth


# ---------------------------------------------------------------------------
# streaming incremental-dedup prefilter
# ---------------------------------------------------------------------------

def test_perrow_band_sigs_equal_batch_memberships(spark, split_corpus):
    """minhash_band_sig_cols (aggregation-free, streaming-legal) must produce
    EXACTLY the band signatures of the batch explode+groupBy derivation."""
    corpus, _ = split_corpus
    per_row = corpus.select(
        F.col("doc_id").alias("id"),
        *[
            s.alias(f"sig{b}")
            for b, s in enumerate(dedup.minhash_band_sig_cols(F.col("text")))
        ],
    )
    got = set()
    for r in per_row.collect():
        for b in range(4):
            v = r[f"sig{b}"]
            if v is not None:
                got.add((r.id, b, v))
    want = {
        (r.id, r.band_idx, r.band_sig)
        for r in dedup.minhash_band_memberships(corpus).collect()
    }
    assert got == want


def test_novel_pages_stream_prefilter(spark, split_corpus, tmp_path):
    """Stream-static prefilter: a streaming page feed drops exactly the pages
    whose band signatures collide with the persisted index (the LSH candidate
    rule), in a real Structured Streaming availableNow run."""
    from openstreetmapio_jl_spark.streaming import pipelines as SP

    corpus, batch = split_corpus  # t4_idx index built by the fixture
    import datetime

    ts = datetime.datetime(2024, 5, 1)
    rows = [
        (f"u{r.doc_id}", ts, b"", r.text, "en") for r in batch.collect()
    ]
    feed_dir = str(tmp_path / "feed")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.parquet(feed_dir)

    idx_m = spark.table("t4_idx_memberships")
    stream = SP.read_pages_stream(spark, feed_dir)
    novel = SP.novel_pages_stream(stream, idx_m)
    SP.run_available_now(
        novel,
        query_name="novel_pages_t4",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {r.url for r in spark.table("novel_pages_t4").collect()}

    # expected: batch docs sharing NO band bucket with the index (batch twin)
    new_m = dedup.minhash_band_memberships(batch)
    colliding = {
        r.id
        for r in new_m.join(
            idx_m, ["band_idx", "band_sig"], "left_semi"
        ).select("id").distinct().collect()
    }
    all_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    want = {f"u{i}" for i in all_ids - colliding}
    assert got == want
    assert 0 < len(got) < len(all_ids)  # both kept and dropped pages exist


def test_incremental_cluster_losers_transitivity_across_index(spark):
    """Survivor rule of the ingest loop: a batch page chained to an indexed
    page only THROUGH another batch page drops too (B~A, A~X indexed, B≁X),
    pure-batch clusters keep their canonical minimum, and pages pairing the
    index directly always lose."""
    # batch = {A, B, C, D, E}; index = {X, Y}
    pairs = spark.createDataFrame(
        [
            ("A", "B"),   # batch-batch
            ("A", "X"),   # A also matches indexed X  -> component {A,B,X}
            ("C", "D"),   # pure-batch cluster        -> component {C,D}
            ("E", "Y"),   # direct vs-index pair      -> component {E,Y}
        ],
        "id_a string, id_b string",
    )
    batch = spark.createDataFrame([("A",), ("B",), ("C",), ("D",), ("E",)], "id string")
    losers = {
        r.url
        for r in dedup.incremental_cluster_losers(pairs, batch).collect()
    }
    # A and B BOTH drop (X's component is already represented in the corpus);
    # C survives as {C,D}'s minimum; E drops against Y
    assert losers == {"A", "B", "D", "E"}


def test_extend_dedup_index_batch_marker_exactly_once(spark, split_corpus):
    """batch_key makes extension exactly-once: the second call with the same
    key is a certified skip and the index tables are unchanged."""
    corpus, batch = split_corpus
    dedup.build_dedup_index(spark, corpus, table_prefix="t4_once", n_buckets=4)
    m0 = spark.table("t4_once_memberships").count()
    assert dedup.extend_dedup_index(
        spark, batch, table_prefix="t4_once", n_buckets=4, batch_key="batch-1"
    ) == "extended"
    m1 = spark.table("t4_once_memberships").count()
    assert m1 > m0
    assert dedup.extend_dedup_index(
        spark, batch, table_prefix="t4_once", n_buckets=4, batch_key="batch-1"
    ) == "skipped"
    assert spark.table("t4_once_memberships").count() == m1
    assert spark.table("t4_once_batches").count() == 1


def test_incremental_dedup_tolerates_crash_duplicate_index_rows(spark, split_corpus):
    """A crash mid-extension can leave a batch's membership/doc rows appended
    twice while stats (partition-overwritten per batch) count it once;
    candidates (.distinct) and the verify text fetch (dropDuplicates) must make
    the duplicate rows invisible — pairs identical to the clean index."""
    corpus, batch = split_corpus
    dedup.build_dedup_index(spark, corpus, table_prefix="t4_dup", n_buckets=4)
    clean = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.incremental_dedup_pairs(
            spark, batch, table_prefix="t4_dup", threshold=0.5, max_bucket_df=50
        ).collect()
    }
    # simulate the crash artifact: corpus memberships+docs appended AGAIN.
    # Stats are NOT touched — the r5 extension writes each batch's counts into
    # its own batch_key partition (dynamic overwrite), so a crash-rerun never
    # double-counts; the duplicate membership/doc rows are the only residue.
    m = dedup.minhash_band_memberships(corpus)
    (
        m.write.mode("append").bucketBy(4, "band_sig").sortBy("band_sig")
        .format("parquet").saveAsTable("t4_dup_memberships")
    )
    (
        corpus.select(F.col("doc_id").alias("id"), F.col("text"))
        .write.mode("append").bucketBy(4, "id").sortBy("id")
        .format("parquet").saveAsTable("t4_dup_docs")
    )
    dup = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.incremental_dedup_pairs(
            spark, batch, table_prefix="t4_dup", threshold=0.5, max_bucket_df=50
        ).collect()
    }
    assert dup == clean


def test_word_repetition_signals_keeps_subbigram_docs(spark):
    """Contract: one row per input doc — single-word docs carry NULL bigram
    fields instead of vanishing through an inner join."""
    from openstreetmapio_jl_spark.functions import text as textfn

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "a a a")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in textfn.word_repetition_signals(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_words == 1 and rows[1].top_bigram is None
    assert rows[1].top_bigram_frac is None
    assert rows[2].top_bigram == "a a" and abs(rows[2].top_bigram_frac - 1.0) < 1e-9


def test_incremental_dedup_empty_batch(spark, split_corpus):
    """Degenerate inputs: an empty incoming batch yields an empty pair frame
    with the right schema (no crash in the collect-and-pushdown verify path)."""
    _corpus, batch = split_corpus
    empty = batch.filter(F.lit(False))
    out = dedup.incremental_dedup_pairs(
        spark, empty, table_prefix="t4_idx", threshold=0.5, max_bucket_df=50
    )
    assert out.columns == ["id_a", "id_b", "jaccard"]
    assert out.count() == 0
