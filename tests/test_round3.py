"""Round-3 additions: bucket-cardinality guards for LSH/band candidate
self-joins (one degenerate hot bucket must not go quadratic), and their
recall-trade semantics (capped buckets are DROPPED, cold buckets unaffected)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.operators import dedup, similarity


BOILER = (
    "breaking news subscribe to our newsletter all rights reserved "
    "cookie policy terms of service contact us about advertising "
)
COLD_A = "an entirely unique survey of alpine butterfly migration routes in spring"
COLD_B = "an entirely unique survey of alpine butterfly migration routes in summer"


@pytest.fixture(scope="module")
def skew_docs(spark):
    # 200 boilerplate clones -> ONE hot bucket per band; 2 cold near-dups
    rows = [(i, BOILER) for i in range(200)]
    rows += [(1000, COLD_A), (1001, COLD_B)]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_jaccard_via_lsh_bucket_cap_drops_hot_bucket(skew_docs):
    capped = dedup.jaccard_via_lsh(skew_docs, threshold=0.5, max_bucket_df=50)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    # the hot boilerplate group contributes ZERO pairs (its buckets exceed the
    # cap); the cold near-dup pair survives untouched
    assert pairs == {(1000, 1001)}


def test_jaccard_via_lsh_cap_disabled_reproduces_quadratic_pairs(spark):
    # sanity on a SMALL clone group (8 docs -> 28 pairs) that uncapped
    # behavior really is quadratic in the bucket, i.e. the guard has a job
    rows = [(i, BOILER) for i in range(8)] + [(100, COLD_A), (101, COLD_B)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.jaccard_via_lsh(docs, threshold=0.5, max_bucket_df=None)
    assert uncapped.count() == 8 * 7 // 2 + 1
    capped = dedup.jaccard_via_lsh(docs, threshold=0.5, max_bucket_df=4)
    assert {(r.id_a, r.id_b) for r in capped.collect()} == {(100, 101)}


def test_simhash_neardup_bucket_cap(skew_docs):
    capped = dedup.simhash_neardup_pairs(skew_docs, max_bucket_df=50)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1000, 1001) in pairs  # cold pair survives (tiny hamming distance)
    assert all(a >= 1000 for a, _ in pairs)  # no boilerplate-clone pairs


def test_embedding_neardup_bucket_cap(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    hot_dir = rng.standard_normal(64)
    cold_dir = rng.standard_normal(64)
    rows = [
        (i, (hot_dir * float(1.0 + 0.01 * i)).tolist()) for i in range(120)
    ]  # 120 parallel vectors -> one hot bucket per table, cos = 1.0
    rows += [
        (1000, cold_dir.tolist()),
        (1001, (cold_dir * 2.0).tolist()),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = similarity.embedding_near_duplicates(
        vecs, threshold=0.9, max_bucket_df=50
    )
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert pairs == {(1000, 1001)}
    uncapped_n = similarity.embedding_near_duplicates(vecs, threshold=0.9).count()
    assert uncapped_n == 120 * 119 // 2 + 1  # quadratic without the guard


def test_bucket_cap_pair_volume_is_linear_in_cold_docs(spark):
    """The scale property itself: with the cap on, candidate-pair volume tracks
    the COLD population, not the hot bucket's square."""
    rows = [(i, BOILER) for i in range(300)]
    rows += [(10_000 + i, f"{COLD_A} variant token{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.jaccard_via_lsh(docs, threshold=0.2, max_bucket_df=50)
    # cold docs share long prefixes -> some pairs; hot group contributes none,
    # so the total is bounded by cold^2 (100), nowhere near 300^2/2
    assert capped.count() <= 45
