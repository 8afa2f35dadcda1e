"""Structured Streaming pipelines vs their batch twins.

With Trigger.AvailableNow + complete/update output, the streaming results must
EQUAL the batch results over the same input — that equality is the oracle here.
Also covers checkpoint resume: a second run over an unchanged source processes
nothing new (idempotent backfill).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from openstreetmapio_jl_spark import streaming as S

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """Events split into 3 parquet files in ts order (multi-file source so the
    sessionizer's cross-batch state path can be exercised via maxFilesPerTrigger)."""
    src = tmp_path_factory.mktemp("events_src")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("ts", "event_id")
    n = ev.count()
    pdf = ev.toPandas()
    cut1, cut2 = n // 3, 2 * n // 3
    for i, part in enumerate((pdf[:cut1], pdf[cut1:cut2], pdf[cut2:])):
        spark.createDataFrame(part, schema=ev.schema).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
    return str(src)


def test_tumbling_stream_equals_batch(spark, stream_src, tmp_path):
    stream = S.read_events_stream(spark, stream_src + "/part*")
    result = S.tumbling_counts_stream(stream)
    S.run_available_now(
        result,
        query_name="t_tumbling",
        output_mode="complete",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = spark.sql("select * from t_tumbling")

    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_sessionize_stream_equals_batch(spark, stream_src, tmp_path):
    # one file per micro-batch → state must carry last_ts across 3 batches
    stream = S.read_events_stream(spark, stream_src + "/part*", max_files_per_trigger=1)
    result = S.sessionize_stream(stream)
    S.run_available_now(
        result,
        query_name="t_sessions",
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # cumulative totals → final state per user = max over emitted updates
    got = spark.sql(
        "select user_id, max(n_sessions) as n_sessions, max(n_events) as n_events "
        "from t_sessions group by user_id"
    )

    from pyspark.sql import Window

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    batch = (
        e.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
        )
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    cols = ["user_id", "n_sessions", "n_events"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_available_now_resume_is_idempotent(spark, stream_src, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    stream = S.read_events_stream(spark, stream_src + "/part*")
    S.run_available_now(
        S.tumbling_counts_stream(stream),
        query_name="t_resume1",
        output_mode="complete",
        checkpoint_dir=ckpt,
    )
    first = _rows(spark.sql("select * from t_resume1"), ["window_start", "event_type", "n"])
    assert len(first) > 0

    # second run, same checkpoint, unchanged source → no new micro-batch output
    S.run_available_now(
        S.tumbling_counts_stream(S.read_events_stream(spark, stream_src + "/part*")),
        query_name="t_resume2",
        output_mode="complete",
        checkpoint_dir=ckpt,
    )
    second = spark.sql("select * from t_resume2").collect()
    assert second == []  # nothing new to process — backfill is idempotent


def test_pip_enrich_stream_matches_batch(spark, tmp_path):
    """Stream-static spatial enrichment: streaming pages PIP-joined against a
    static polygon dimension equals the batch join on the same input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from openstreetmapio_jl_spark.operators import spatial_join as SJ

    ring = [(49.9, 7.9), (49.9, 8.1), (50.1, 8.1), (50.1, 7.9), (49.9, 7.9)]
    rings = spark.createDataFrame(
        [(5, None, [{"lat": a, "lon": o} for a, o in ring])],
        "id long, tags map<string,string>, ring array<struct<lat:double,lon:double>>",
    )
    polys = SJ.polygons_with_edges(rings)

    src = tmp_path / "pages_src"
    src.mkdir()
    rows = [
        ("u_in1", "visit geo:50.0000000,8.0000000 now"),
        ("u_in2", "also geo:50.0500000,7.9500000 here"),
        ("u_out", "far geo:10.0000000,10.0000000 away"),
        ("u_none", "no mention at all"),
    ]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "warc_ts": pa.array([None] * len(rows), pa.timestamp("us")),
                "html": pa.array([b""] * len(rows), pa.binary()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
            }
        ),
        str(src / "part-0.parquet"),
    )
    hits = S.pip_enrich_stream(
        S.read_pages_stream(spark, str(src)), polys, zoom=10
    ).select("url", "polygon_id")
    S.run_available_now(
        hits,
        query_name="t_pip_stream",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt_pip"),
    )
    got = {
        (r.url, r.polygon_id)
        for r in spark.sql("select * from t_pip_stream").collect()
    }
    assert got == {("u_in1", 5), ("u_in2", 5)}
