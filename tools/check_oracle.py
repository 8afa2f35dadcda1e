"""Driver-mimic: run every __spark_entry__ query against its DuckDB oracle.

Compares row count, sorted-by-name column sets, and order-insensitive values
(rounded stringification) — the same shape as the driver's CORRECTNESS check.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from openstreetmapio_jl_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows-only, n={len(srows)}")
            skipped += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {str(exc)[:200]}")
            failed += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            failed += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            failed += 1
            continue
        s = rowset(scols, [[r[c] for c in scols] for r in srows])
        o = rowset(ocols, orows)
        if s != o:
            ndiff = sum(1 for a, b in zip(s, o) if a != b)
            print(f"FAIL  {name}: values differ ({ndiff} of {len(s)} rows)")
            for a, b in list(zip(s, o))[:400]:
                if a != b:
                    print(f"   spark: {a}\n   duck : {b}")
                    break
            failed += 1
            continue
        print(f"ok    {name}: {len(srows)} rows")
        passed += 1
    print(f"\n{passed} ok, {failed} fail, {skipped} weak")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
