"""Replicate the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row-count, column names, and order-insensitive values.

Usage: python scripts/parity_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{round(v, 9):.9f}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from mlscraper_spark.session import get_spark

    spark = get_spark("parity-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sorted(sdf.columns)
            spark_rows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(spark_rows)})")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        duck_cols = sorted(ddf.columns)
        duck_rows = ddf.to_dict("records")
        status = []
        if len(spark_rows) != len(duck_rows):
            status.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if spark_cols != duck_cols:
            status.append(f"columns {spark_cols} vs {duck_cols}")
        if not status:
            a = normalize(spark_rows, spark_cols)
            b = normalize(duck_rows, duck_cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"values differ, first diffs: {diff}")
        took = time.time() - t0
        if status:
            failures.append((name, "; ".join(status)))
            print(f"FAIL {name} ({took:.1f}s): {'; '.join(status)}")
        else:
            print(f"OK   {name} ({took:.1f}s, {len(spark_rows)} rows)")

    print(f"\n{len(failures)} failures")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
