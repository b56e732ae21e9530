"""Local replica of the driver's parity gate: run every registry query in
Spark and its ANSI-SQL oracle in DuckDB over the same parquet, compare
schema (sorted column names) and the exact sorted row multiset.

Usage:
  python scripts/parity_check.py [--sf /root/testdata/sf0.001] [--queries a,b]

Exit 0 iff every checked query matches.
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "lineitem", "orders", "customer", "part", "supplier", "nation", "region",
    "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return ("0-none",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("1-f", "NaN")
        return ("1-f", v.hex())  # exact bit compare for doubles
    return ("2-v", str(type(v).__name__), str(v))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from mlscraper_spark.session import get_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.queries.split(",") if args.queries else sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    spark = get_spark("parity-check")
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(_norm(row[c]) for c in scols) for row in sdf.collect()
            )
            ores = con.execute(oracles[name])
            ocols_raw = [d[0] for d in ores.description]
            ocols = sorted(ocols_raw)
            orows = sorted(
                tuple(_norm(r[ocols_raw.index(c)]) for c in ocols)
                for r in ores.fetchall()
            )
            ok_schema = scols == ocols
            ok_rows = srows == orows
            status = "OK" if (ok_schema and ok_rows) else "FAIL"
            print(f"{name}: {status} spark={len(srows)} oracle={len(orows)}"
                  + ("" if ok_schema else f" SCHEMA {scols} vs {ocols}"))
            if status == "FAIL":
                failed.append(name)
                for i, (a, b) in enumerate(zip(srows, orows)):
                    if a != b:
                        print(f"  first diff row {i}:\n   spark={a}\n   orcl ={b}")
                        break
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)
    spark.stop()
    print("FAILED:", failed if failed else "none")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
