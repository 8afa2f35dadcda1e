"""HyperLogLog sketch (operators/sketches.py): accuracy envelopes, the exact
merge law, duplicate-insensitivity, grouping, and input validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.operators import sketches


def _vals(spark, n, prefix="v", start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit(prefix + "-"), F.col("id")).alias("v")
    )


def test_estimate_within_error_envelope(spark):
    # p=9 → rse ≈ 4.6%; 15% is > 3 sigma. Deterministic hash → stable result.
    est = float(sketches.hll_distinct(_vals(spark, 5000), "v").collect()[0][0])
    assert abs(est - 5000) / 5000 < 0.15


def test_small_range_linear_counting(spark):
    # 100 << 2.5m → the m·ln(m/V) branch; much tighter than the raw estimator
    est = float(sketches.hll_distinct(_vals(spark, 100), "v").collect()[0][0])
    assert abs(est - 100) / 100 < 0.10


def test_merge_equals_union_exactly(spark):
    a, b = _vals(spark, 3000), _vals(spark, 4000, start=2000)
    merged = sketches.hll_estimate(
        sketches.hll_merge(
            sketches.hll_registers(a, "v"), sketches.hll_registers(b, "v")
        )
    ).collect()
    union = sketches.hll_distinct(a.unionByName(b), "v").collect()
    assert merged == union  # exact decimal equality, not approximate


def test_duplicates_do_not_move_the_estimate(spark):
    a = _vals(spark, 1000)
    dup3 = a.unionByName(a).unionByName(a)
    one = sketches.hll_distinct(a, "v").collect()
    three = sketches.hll_distinct(dup3, "v").collect()
    assert one == three  # registers are a function of the value SET


def test_groupwise_estimates(spark):
    df = spark.range(4000).select(
        F.when(F.col("id") < 3000, F.lit("big")).otherwise(F.lit("small")).alias("g"),
        # disjoint value spaces per group
        F.concat(F.lit("g"), (F.col("id") < 3000).cast("int"), F.lit("-"), F.col("id")).alias("v"),
    )
    out = {r.g: float(r.est_distinct) for r in sketches.hll_distinct(df, "v", ("g",)).collect()}
    assert abs(out["big"] - 3000) / 3000 < 0.15
    assert abs(out["small"] - 1000) / 1000 < 0.15


def test_nulls_are_skipped(spark):
    df = _vals(spark, 200).unionByName(
        spark.range(5).select(F.lit(None).cast("string").alias("v"))
    )
    with_nulls = sketches.hll_distinct(df, "v").collect()
    without = sketches.hll_distinct(_vals(spark, 200), "v").collect()
    assert with_nulls == without


def test_p_out_of_range_raises(spark):
    with pytest.raises(ValueError, match="p must be"):
        sketches.hll_registers(_vals(spark, 10), "v", p=2)
