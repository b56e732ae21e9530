"""Spark-component scaling ceilings on THIS host: what 4-vs-16-core ratio
plain Spark building blocks achieve, independent of the crawl engine.

The pure-CPU probe (host_calibrate.py) reads ~3.65-3.9x for 4x process
width; a streaming-memcpy probe reads ~2.0x (the VM's memory bandwidth
saturates near 50 GB/s).  Spark SQL work sits between those poles, so no
engine built on Spark can exceed these component ratios on this machine —
they are the denominator for interpreting the crawl ladder's efficiency.

Components (each a subprocess leg, own JVM, 2 GiB/core, min of 2 runs):
  codegen  — the engine's canonicalization expressions over 48M synthetic
             links (string-heavy whole-stage codegen, no shuffle)
  shuffle  — 30M-row hash aggregation with a string key (Exchange +
             partial/final agg: parquet-free, bandwidth-heavy)
  python   — 12M rows through a vectorized mapInPandas (Arrow both ways)

Usage: python scripts/spark_ceiling.py [outfile]
One JSON line per component + a summary line; also written to outfile
(default BENCH/spark_ceiling.json).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1 and sys.argv[1] == "--leg":
    _LEG = (sys.argv[2], int(sys.argv[3]))
else:
    _LEG = None
    OUTFILE = sys.argv[1] if len(sys.argv) > 1 else "BENCH/spark_ceiling.json"
    WIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    NARROW = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def _leg(component: str, cores: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    spark = (
        SparkSession.builder.appName(f"ceiling-{component}-{cores}")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", f"{2 * cores}g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    if component == "codegen":
        from mlscraper_spark.crawl.engine import canonicalize_frame

        df = spark.range(48_000_000, numPartitions=64).select(
            F.when(F.col("id") % 4 == 0, F.format_string(
                "http://host%d.test/page/%d", F.col("id") % 9973, F.col("id") % 37))
            .when(F.col("id") % 4 == 1, F.format_string(
                "http://HOST%d.TEST/page/%d#f", F.col("id") % 9973, F.col("id") % 37))
            .when(F.col("id") % 4 == 2, F.format_string(
                "http://host%d.test/page/%d?z=1&a=2", F.col("id") % 9973, F.col("id") % 37))
            .otherwise(F.format_string(
                "http://host%d.test/private/%d", F.col("id") % 9973, F.col("id") % 5))
            .alias("raw"))
        out = canonicalize_frame(df, "raw")
        # consume the outputs (a bare count() lets Catalyst prune the
        # whole canonicalization projection away)
        job = out.select(
            F.sum(F.length("url_canon")).alias("a"),
            F.sum(F.length("host")).alias("b"),
        )

        def run():
            job.collect()
    elif component == "shuffle":
        df = spark.range(30_000_000, numPartitions=64).select(
            F.format_string("host%d.test", F.col("id") % 1_000_000).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        agg = df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))

        def run():
            agg.selectExpr("sum(s)", "sum(c)").collect()
    elif component == "python":
        import pandas as pd

        def vec(batches):
            import numpy as np

            for pdf in batches:
                yield pd.DataFrame({"h": pd.util.hash_pandas_object(
                    pdf["s"]).to_numpy().view(np.int64)})

        df = spark.range(12_000_000, numPartitions=64).select(
            F.format_string("http://host%d.test/page/%d", F.col("id") % 9973,
                            F.col("id") % 37).alias("s"))
        job = df.mapInPandas(vec, "h long")
        # warm python workers
        spark.range(64, numPartitions=64).mapInPandas(
            lambda it: (pd.DataFrame({"h": [1]}) for _ in it), "h long").count()

        def run():
            job.count()
    else:
        raise SystemExit(f"unknown component {component}")

    run()  # warm (codegen compile, page cache)
    best = None
    for _ in range(2):
        t0 = time.time()
        run()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"component": component, "cores": cores,
                      "sec": round(best, 2)}))


def _cooldown(threshold: float = 1.5, max_wait: int = 240) -> None:
    waited = 0
    while waited < max_wait:
        with open("/proc/loadavg") as f:
            if float(f.read().split()[0]) < threshold:
                return
        time.sleep(10)
        waited += 10


def main() -> None:
    results = {"wide_cores": WIDE, "narrow_cores": NARROW}
    factor = WIDE / NARROW
    for comp in ("codegen", "shuffle", "python"):
        secs = {}
        for cores in (WIDE, NARROW):
            _cooldown()
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", comp,
                 str(cores)],
                capture_output=True, text=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            secs[cores] = rec["sec"]
            print(line, flush=True)
        results[comp] = {
            "t_wide": secs[WIDE], "t_narrow": secs[NARROW],
            "speedup": round(secs[NARROW] / secs[WIDE], 2),
            "efficiency": round(secs[NARROW] / secs[WIDE] / factor, 2),
        }
    print(json.dumps(results))
    os.makedirs(os.path.dirname(OUTFILE) or ".", exist_ok=True)
    with open(OUTFILE, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    if _LEG is not None:
        _leg(_LEG[0], _LEG[1])
    else:
        main()
