"""Deterministic cardinality sketches: HyperLogLog as Catalyst column math.

COUNT(DISTINCT x) at 100 TB is a full-cardinality shuffle — every distinct
value crosses the wire once. The sketch shape is a map-side-combined MAX per
(group, register-bucket): at most ``m`` (here 512) rows per group ever move,
regardless of cardinality, and registers MERGE by max — sketches built per
partition / per day / per table union for free and re-estimate without
touching the raw data (``hll_merge`` + exact-equality test). This is the
mergeable-aggregate architecture of Flajolet–Fusy–Gandouet–Meunier 2007
(the public HyperLogLog paper), with two portability choices so an
independent engine (the DuckDB oracle) reproduces estimates BIT-IDENTICALLY:

- the hash is the first 15 hex chars of md5 (a 60-bit positive integer —
  engine-portable, unlike ``xxhash64``/``hash()``); bucket = top ``p`` bits,
  rho = leading-zero rank of the remaining ``60-p`` bits computed by
  bit-smear + ``bit_count`` (pure integer ops — no float ``log2`` whose
  libm rounding could disagree between engines);
- the harmonic denominator Σ 2^(-reg) is summed SCALED BY 2^(61-p) as exact
  BIGINT arithmetic (each term 2^k is double-exact, the sum is
  order-independent integer addition), so the only cross-engine float ops
  are one literal-parsed constant, one IEEE division, and the final
  round() — all deterministic. (A raw double Σ 2^(-reg) would depend on
  addition order across 512 registers.)

Spark's own ``approx_count_distinct`` is HLL++ with an engine-private hash —
fine in production, impossible to oracle-check. This one is both.

The reference repo has no sketch surface; its closest analog is the exact
tag-count dictionaries its callbacks accumulate (``src/load_pbf.jl``) —
this is the bounded-memory form of the same question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P_DEFAULT = 9  # 512 registers → relative standard error ≈ 1.04/√512 ≈ 4.6%


def _alpha_m2_scaled(p: int) -> float:
    """alpha_m · m² · 2^(61-p) — the whole numerator as ONE Python double,
    inlined as a literal in both engines so no cross-engine constant
    arithmetic happens."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * (2.0 ** (61 - p))


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    *,
    p: int = HLL_P_DEFAULT,
) -> DataFrame:
    """→ ``(*group_cols, bucket, reg)``: the sketch itself — per group, the
    max leading-zero rank seen in each of the 2^p register buckets. The agg
    is a map-side-combined MAX: the shuffle moves ≤ 2^p rows per group.
    NULL values are skipped (COUNT DISTINCT semantics)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    nbits = 60 - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, h.alias("h")
    )
    d = d.select(
        *group_cols,
        F.shiftright("h", nbits).alias("bucket"),
        (F.col("h") - F.shiftleft(F.shiftright("h", nbits), nbits)).alias("w"),
    )
    # leading-zero rank without float log2: smear all bits below the MSB
    # (the RUNNING value, so the 6 shifts cover all 51 positions), then
    # popcount. w == 0 → rho = nbits+1 (all-zero suffix).
    smear = F.col("w")
    for k in (1, 2, 4, 8, 16, 32):
        smear = smear.bitwiseOR(F.shiftright(smear, k))
    rho = F.lit(nbits + 1) - F.bit_count(smear)
    return (
        d.select(*group_cols, "bucket", rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Union two register tables (same p!) into one sketch: per-bucket MAX.
    sketch(A) ⊕ sketch(B) == sketch(A ∪ B) EXACTLY — registers are
    deterministic functions of the value set, so this is equality, not
    approximation (test-pinned)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    *,
    p: int = HLL_P_DEFAULT,
    round_dp: int = 2,
) -> DataFrame:
    """→ ``(*group_cols, est_distinct)``: the HLL estimate with the standard
    small-range linear-counting correction (E ≤ 2.5m with empty registers →
    m·ln(m/V)). All register-sum arithmetic is exact BIGINT; see module
    docstring for why the result is bit-identical cross-engine."""
    m = 1 << p
    scale = 61 - p  # max rho = (60-p)+1 → max exponent scale-0 ≤ 2^(61-p)
    per_term = F.pow(F.lit(2.0), F.lit(scale) - F.col("reg")).cast("long")
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("nonempty"),
        F.sum(per_term).alias("sum_scaled"),
    )
    # empty registers contribute 2^scale each (2^-0, scaled); V of them
    v = F.lit(m) - F.col("nonempty")
    denom = F.col("sum_scaled") + v * F.lit(1 << scale)
    e_raw = F.lit(_alpha_m2_scaled(p)) / denom.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    out = F.round(est, round_dp).cast(f"decimal(18,{round_dp})")
    return agg.select(*group_cols, out.alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    *,
    p: int = HLL_P_DEFAULT,
    round_dp: int = 2,
) -> DataFrame:
    """One-shot convenience: registers + estimate."""
    regs = hll_registers(df, value_col, group_cols, p=p)
    return hll_estimate(regs, group_cols, p=p, round_dp=round_dp)
