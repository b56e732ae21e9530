"""Standalone crawl probe — the bench.py frontier probe, run on a
VERIFIED-idle host (round-4 'What's wrong #2': the 12,099 URLs/s r3-idle
probe vs 6,352 r4-idle needed a calm-window reproduction; bench.py's
in-run probe legs inherit the query loop's ~1.3 loadavg residue).

Identical workload to bench.py _throughput's crawl half: 100k hosts,
links_per_page=10, budget 8, 2 epochs (~500,830 URLs), local[32],
best-of-N legs with a cooldown to a STRICTER threshold before each leg.

Usage: python scripts/crawl_probe.py [legs] [idle_threshold]
Appends one JSON line to stdout; caller redirects to BENCH/.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEGS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
THRESHOLD = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _wait_idle(threshold: float, max_wait: float = 1200.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if _loadavg() < threshold:
            return True
        time.sleep(10)
    return False


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _warm_python_workers
    from mlscraper_spark.crawl.engine import CrawlConfig, read_fetch_log, run_crawl
    from mlscraper_spark.crawl.synthweb import WebConfig
    from mlscraper_spark.session import get_spark

    met0 = _wait_idle(THRESHOLD)
    spark = get_spark("crawl-probe", master="local[32]", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()
    _warm_python_workers(spark)

    web = WebConfig(n_hosts=100000, max_pages_per_host=40, links_per_page=10)
    seeds = spark.range(web.n_hosts).select(
        F.format_string("http://host%d.test/page/0", F.col("id")).alias("raw")
    )
    legs, loads, met = [], [], [met0]
    best, n_urls = None, None
    for i in range(LEGS):
        if i:
            met.append(_wait_idle(THRESHOLD))
        loads.append(_loadavg())
        root = tempfile.mkdtemp(prefix="probe_crawl_")
        t0 = time.time()
        run_crawl(spark, root, seeds, web,
                  CrawlConfig(budget_per_host=8, n_buckets=32), max_epochs=2)
        leg = time.time() - t0
        legs.append(round(leg, 1))
        if best is None or leg < best:
            best = leg
            n_urls = read_fetch_log(spark, root).count()
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    print(json.dumps({
        "n_urls": n_urls,
        "legs_sec": legs,
        "leg_loadavg": loads,
        "idle_met": met,
        "idle_threshold": THRESHOLD,
        "urls_per_sec": round(n_urls / best, 1),
    }))


if __name__ == "__main__":
    main()
