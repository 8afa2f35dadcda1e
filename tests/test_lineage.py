"""Idempotent-resume protocol (plans/lineage.py): per-chunk lineage records,
anti-join resume, crash-safe chunk rewrite. north_rule: "resumable from
checkpoint with per-partition lineage + metrics"."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from openstreetmapio_jl_spark.plans import lineage as L

SF_DIR = "/root/testdata/sf0.001"


def _chunk_fn(spark):
    """Chunked job: per-nation order revenue, chunk key = region key of the
    nation (5 chunks over the TPC-H-ish driver tables)."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")

    def process(key: str):
        nats = nation.filter(F.col("n_regionkey") == int(key))
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nats), cust.c_nationkey == nats.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"))
        )

    return process


def _expected(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    return sorted(
        (r.n_name, r.n_orders)
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"))
        .collect()
    )


def test_full_run_then_rerun_is_noop(spark, tmp_path):
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")
    keys = [str(k) for k in range(5)]
    s1 = L.run_resumable(spark, keys, _chunk_fn(spark), out_dir=out, lineage_dir=lin)
    assert s1["processed"] == 5 and s1["skipped"] == 0

    got = sorted(
        (r.n_name, r.n_orders) for r in L.read_output(spark, out).collect()
    )
    assert got == _expected(spark)

    # lineage carries metrics per chunk
    recs = L.LineageLog(spark, lin).records().collect()
    assert len(recs) == 5
    assert all(r.n_rows == 5 and r.wall_s > 0 and r.run_id == s1["run_id"] for r in recs)

    # rerun: everything already committed → no-op, output unchanged
    s2 = L.run_resumable(spark, keys, _chunk_fn(spark), out_dir=out, lineage_dir=lin)
    assert s2["processed"] == 0 and s2["skipped"] == 5
    assert sorted(
        (r.n_name, r.n_orders) for r in L.read_output(spark, out).collect()
    ) == _expected(spark)


def test_resume_after_partial_failure(spark, tmp_path):
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")
    keys = [str(k) for k in range(5)]

    # run only 2 chunks (simulated crash after chunk 1)
    L.run_resumable(spark, keys[:2], _chunk_fn(spark), out_dir=out, lineage_dir=lin)
    # simulate a chunk that crashed MID-WRITE: partial output, no lineage commit
    shutil.rmtree(f"{out}/chunk=2", ignore_errors=True)
    import os

    os.makedirs(f"{out}/chunk=2", exist_ok=True)
    with open(f"{out}/chunk=2/_half_written_garbage", "w") as f:
        f.write("partial")

    # resume: chunks 0-1 skipped, 2-4 processed; the half-written dir is overwritten
    s = L.run_resumable(spark, keys, _chunk_fn(spark), out_dir=out, lineage_dir=lin)
    assert s["skipped"] == 2 and s["processed"] == 3
    assert not os.path.exists(f"{out}/chunk=2/_half_written_garbage")
    assert sorted(
        (r.n_name, r.n_orders) for r in L.read_output(spark, out).collect()
    ) == _expected(spark)

    # no duplicate lineage keys
    recs = L.LineageLog(spark, lin).records().collect()
    assert len({r.chunk_key for r in recs}) == len(recs) == 5


def test_one_spark_job_per_chunk(spark, tmp_path):
    """The chunk write is the chunk's ONLY Spark job: n_rows comes from an
    Observation metric riding the write, not a re-read count() (which doubled
    the job count and re-read all output — 100k extra jobs at log scale).
    Exchange-free chunk queries so AQE can't split the write into stages."""
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")
    keys = [str(k) for k in range(5)]

    def process(key: str):
        return spark.range(10 * int(key) + 1).select(
            F.col("id"), F.lit(key).alias("k")
        )

    sc = spark.sparkContext
    sc.setJobGroup("lineage-chunks", "one write job per chunk")
    try:
        stats = L.run_resumable(spark, keys, process, out_dir=out, lineage_dir=lin)
        jobs = list(sc.statusTracker().getJobIdsForGroup("lineage-chunks"))
    finally:
        sc.setJobGroup("lineage-post", "")
    assert stats["processed"] == 5
    assert len(jobs) == 5  # exactly the 5 writes — zero bookkeeping jobs
    # observed counts match the data (1, 11, 21, 31, 41 rows)
    recs = {r.chunk_key: r.n_rows for r in L.LineageLog(spark, lin).records().collect()}
    assert recs == {str(k): 10 * k + 1 for k in range(5)}
    # pending-set semantics unchanged: rerun is a committed no-op
    s2 = L.run_resumable(spark, keys, process, out_dir=out, lineage_dir=lin)
    assert s2["processed"] == 0 and s2["skipped"] == 5


def test_filter_pending_anti_join(spark, tmp_path):
    lin = str(tmp_path / "lineage")
    log = L.LineageLog(spark, lin)
    log.commit("a", 10, "run1", 0.1)
    log.commit("b", 20, "run1", 0.2)
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "k string, v int")
    left = L.filter_pending(df, "k", log)
    assert sorted(r.k for r in left.collect()) == ["c"]
