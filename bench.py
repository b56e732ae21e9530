"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": <float>, ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect).  Set BENCH_QUERIES=name1,name2 to subset;
BENCH_MASTER to override the master (used for the N-vs-4N scaling runs
recorded in BENCH/BASELINE.md).
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",   # scan + partial/final agg
    "q04_shuffle_join",      # large shuffle join
    "q05_topk_per_group",    # windowed top-k (frontier dequeue shape)
    "q19_minhash_lsh_pairs", # minhash-LSH dedup
    "q21_cosine_topk",       # brute-force similarity
    "q23_extract_scraper",   # distributed DOM parse + plan extraction
    "q24_match_scan",        # distributed value-match scan
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = os.environ.get("BENCH_QUERIES")
    names = names.split(",") if names else HEADLINE
    master = os.environ.get("BENCH_MASTER")

    from mlscraper_spark.queries import QUERIES
    from mlscraper_spark.session import get_spark

    spark = get_spark("mlscraper-spark-bench", master=master)
    # warm the JVM/python workers so startup cost isn't attributed to q1
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    out = {
        "metric": "headline query wall time (lower is better)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "master": spark.sparkContext.master,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
