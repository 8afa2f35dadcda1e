"""Per-partition lineage records + idempotent resume (BASELINE.json north_rule).

Every long-running stage processes its input in CHUNKS (blob ranges, cell
ranges, tile prefixes — any stable partition key). After a chunk's output is
durably written, one lineage row (chunk key, row count, run id, wall seconds)
is appended to a checkpoint table. A restarted job anti-joins its chunk list
against the lineage table and processes only what's missing; chunk outputs are
written with per-chunk overwrite so a chunk that crashed mid-write is simply
rewritten. The result: any stage resumes idempotently — re-running a completed
pipeline is a no-op, re-running a half-finished one completes exactly the
missing chunks, and output never contains duplicates.

The same parquet layout would be an Iceberg table on a real deployment (atomic
append snapshots); plain parquet-append keeps the sandbox dependency-free while
preserving the protocol (write output → THEN commit lineage).

Scale shape of the log itself: commits are single-row parquet files written
with pyarrow directly (no Spark job per chunk — a 100k-chunk run must not pay
100k job-scheduling round-trips for bookkeeping), and the log COMPACTS itself
every ``compact_every`` files (rewrite-all-as-one, then delete the inputs), so
resume cost stays O(compacted files), not O(total chunks ever committed).
Compaction's crash window (compacted file written, old files not yet deleted)
can only DUPLICATE rows, never lose them — and every consumer
(``completed_keys``, ``filter_pending``) reads the key set through a distinct,
so duplicate lineage rows are semantically invisible.

The reference has no persistence at all (SURVEY.md Table B: sinks none) — this
module is the scale-grade replacement for its "rerun the whole file" model.
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "chunk_key string, n_rows long, run_id string, wall_s double, completed_at timestamp"
)

# chunk keys become path components (chunk=<key>) and hive-glob matches; a '/',
# '=', '*' or similar silently breaks the layout AND the resume anti-join, so
# reject anything outside a conservative path-safe alphabet up front
import re as _re

_CHUNK_KEY_RE = _re.compile(r"^[A-Za-z0-9._-]+$")


def validate_chunk_key(key: str) -> str:
    if not _CHUNK_KEY_RE.match(key):
        raise ValueError(
            f"invalid chunk key {key!r}: keys are embedded in output paths "
            "(chunk=<key>) and must match [A-Za-z0-9._-]+"
        )
    return key


class LineageLog:
    """Append-only chunk-completion log backed by a parquet directory.

    ``compact_every``: when the directory holds at least this many parquet
    files after a commit, they are rewritten as one file (0 disables)."""

    def __init__(self, spark: SparkSession, path: str, *, compact_every: int = 128):
        self.spark = spark
        self.path = path
        self.compact_every = compact_every

    def _files(self) -> list[str]:
        if not os.path.exists(self.path):
            return []
        return sorted(
            os.path.join(dp, fn)
            for dp, _dirs, fns in os.walk(self.path)
            for fn in fns
            if fn.endswith(".parquet")
        )

    def completed_keys(self) -> set[str]:
        """Driver-side key-set read: pyarrow column scan over the log files —
        no Spark job for the resume decision (it runs before any cluster work)."""
        import pyarrow.dataset as ds

        files = self._files()
        if not files:
            return set()
        table = ds.dataset(files, format="parquet").to_table(columns=["chunk_key"])
        return set(table["chunk_key"].to_pylist())

    def records(self) -> DataFrame:
        if not self._files():
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)

    def commit(self, chunk_key: str, n_rows: int, run_id: str, wall_s: float) -> None:
        """One single-row parquet file per commit, written driver-side with
        pyarrow (no Spark job), then opportunistic compaction."""
        import datetime

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.path, exist_ok=True)
        table = pa.table(
            {
                "chunk_key": pa.array([chunk_key], pa.string()),
                "n_rows": pa.array([int(n_rows)], pa.int64()),
                "run_id": pa.array([run_id], pa.string()),
                "wall_s": pa.array([float(wall_s)], pa.float64()),
                "completed_at": pa.array(
                    [datetime.datetime.now(datetime.timezone.utc)],
                    pa.timestamp("us", tz="UTC"),
                ),
            }
        )
        pq.write_table(
            table, os.path.join(self.path, f"commit-{uuid.uuid4().hex}.parquet")
        )
        if self.compact_every and len(self._files()) >= self.compact_every:
            self.compact()

    def compact(self) -> int:
        """Rewrite all current log files as ONE file, then delete them.
        Write-then-delete ordering: a crash mid-compaction leaves duplicate
        rows (harmless — consumers read distinct keys), never missing ones.
        Returns the number of input files compacted."""
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        files = self._files()
        if len(files) <= 1:
            return 0
        table = ds.dataset(files, format="parquet").to_table()
        out = os.path.join(self.path, f"compact-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, out)
        for f in files:
            os.remove(f)
        return len(files)


def filter_pending(df: DataFrame, key_col: str, log: LineageLog) -> DataFrame:
    """Drop rows whose chunk key is already committed — the distributed face of
    resume (anti-join against the lineage table)."""
    done = log.records().select(F.col("chunk_key").alias(key_col)).distinct()
    return df.join(done, key_col, "left_anti")


def run_resumable(
    spark: SparkSession,
    chunk_keys: list[str],
    process_chunk: Callable[[str], DataFrame],
    *,
    out_dir: str,
    lineage_dir: str,
    run_id: str | None = None,
    compact_every: int = 128,
) -> dict:
    """Process ``chunk_keys`` resumably.

    For each not-yet-committed key: ``process_chunk(key)`` builds the chunk's
    result DataFrame (distributed); it is written to ``<out_dir>/chunk=<key>``
    with overwrite (idempotent re-write of half-written chunks), then the chunk
    is committed to the lineage log. Returns run statistics."""
    from pyspark.sql import Observation

    run_id = run_id or uuid.uuid4().hex[:12]
    for key in chunk_keys:
        validate_chunk_key(key)
    log = LineageLog(spark, lineage_dir, compact_every=compact_every)
    done = log.completed_keys()
    pending = [k for k in chunk_keys if k not in done]
    stats = {"run_id": run_id, "skipped": len(done & set(chunk_keys)), "processed": 0, "rows": 0}
    for key in pending:
        t0 = time.perf_counter()
        result = process_chunk(key)
        chunk_path = f"{out_dir}/chunk={key}"
        # Row count rides the write job itself via an Observation metric — the
        # write is the chunk's ONLY Spark job. (The previous design re-read the
        # just-written chunk with spark.read...count(): one extra job plus a
        # full second read of all output per run — 100k chunks meant 100k
        # bookkeeping jobs, the exact cost the single-row pyarrow commit path
        # was built to avoid.)
        obs = Observation(f"lineage_{key}")
        observed = result.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        observed.write.mode("overwrite").parquet(chunk_path)
        n = int(obs.get["n_rows"])
        log.commit(key, n, run_id, time.perf_counter() - t0)
        stats["processed"] += 1
        stats["rows"] += n
    return stats


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """All committed chunk outputs as one DataFrame (hive-style chunk= partitions)."""
    return spark.read.option("basePath", out_dir).parquet(f"{out_dir}/chunk=*")
