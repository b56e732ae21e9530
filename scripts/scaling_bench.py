"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N-vs-4N-executors criterion
is evidenced as directed: the same job on the same input at local[4] and
local[16] (N and 4N cores), reporting throughput at both plus scaling
efficiency ((T_small / T_big) / (cores_big / cores_small)).  N=4 is chosen
so that 4N stays within the machine's 16 physical cores — beyond them SMT
adds < 1.4x and would measure the hardware, not the engine (raw
multiprocessing on this box: 8->32 procs = 3.1x; 4->16 = ~4x).

Workloads:
  A. extraction throughput — fetch+parse+image-extract over M synthetic
     URLs (the graft's hot path; Arrow UDF, CPU-bound, no shuffle);
  B. frontier throughput — full BSP crawl epochs over a wide synthetic web
     (politeness windows, robots join, cuckoo/anti-join seen-check,
     snapshot IO included).

Usage: python scripts/scaling_bench.py [M_urls] [crawl_hosts]
Writes JSON to stdout and BENCH/scaling.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M_URLS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
CRAWL_EPOCH_NOTE = "epoch width must dwarf the ~8s/epoch fixed cost (snapshots, scheduling) for the efficiency measurement to reflect the engine rather than constant overhead"
CRAWL_HOSTS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
PARTITIONS = 128


def extraction_job(spark, m_urls: int) -> tuple[float, int]:
    """Returns (seconds, image rows)."""
    from pyspark.sql import functions as F

    from mlscraper_spark.crawl.synthweb import WebConfig
    from mlscraper_spark.images.ops import fetch_and_extract_images

    web = WebConfig(n_hosts=200, max_pages_per_host=50)

    # URL list built JVM-side; fetch+parse+extract fused in ONE Arrow stage.
    # page counts from WebConfig itself (literal lookup) — one formula only
    host = F.col("id") % web.n_hosts
    pages_arr = F.array(*[F.lit(web.n_pages(i)) for i in range(web.n_hosts)])
    n_pages = F.element_at(pages_arr, (host + 1).cast("int"))
    urls = (
        spark.range(m_urls)
        .repartition(PARTITIONS)
        .select(
            F.concat(
                F.lit("http://host"), host.cast("string"), F.lit(".test/page/"),
                (F.col("id") % n_pages).cast("string"),
            ).alias("url_canon")
        )
    )
    images = fetch_and_extract_images(urls, web)
    t0 = time.time()
    n = images.count()
    return time.time() - t0, n


def crawl_job(spark, n_hosts: int, workdir: str) -> tuple[float, int]:
    """Returns (seconds, urls fetched) for a 2-epoch wide crawl."""
    from mlscraper_spark.crawl.engine import CrawlConfig, read_fetch_log, run_crawl
    from mlscraper_spark.crawl.synthweb import WebConfig

    web = WebConfig(n_hosts=n_hosts, max_pages_per_host=40, links_per_page=4)
    seeds = [f"http://{web.host_name(i)}/page/0" for i in range(n_hosts)]
    shutil.rmtree(workdir, ignore_errors=True)
    t0 = time.time()
    run_crawl(spark, workdir, seeds, web,
              CrawlConfig(budget_per_host=8, n_buckets=32), max_epochs=2)
    took = time.time() - t0
    n = read_fetch_log(spark, workdir).count()
    shutil.rmtree(workdir, ignore_errors=True)
    return took, n


def run_at(master: str, tag: str) -> dict:
    from mlscraper_spark.session import get_spark

    spark = get_spark(f"scaling-{tag}", master=master,
                      shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM
    # shared warmup recipe — per-session interpreter fork+import is
    # cluster startup, not engine throughput, and it biases the two legs
    # differently
    from bench import _warm_python_workers

    _warm_python_workers(spark)
    ext_sec, ext_rows = extraction_job(spark, M_URLS)
    crawl_sec, crawl_urls = crawl_job(spark, CRAWL_HOSTS, f"/tmp/scaling_{tag}")
    spark.stop()
    return {
        "master": master,
        "extract_sec": round(ext_sec, 2),
        "extract_rows": ext_rows,
        "extract_rows_per_sec": round(ext_rows / ext_sec, 1),
        "crawl_sec": round(crawl_sec, 2),
        "crawl_urls": crawl_urls,
        "urls_per_sec": round(crawl_urls / crawl_sec, 1),
    }


def main():
    # the sandbox host occasionally carries external load; a local[16]
    # leg degrades ~1.4x under it while local[4] barely moves, which
    # corrupts the efficiency ratio — record the starting load so a run
    # taken on a busy host is identifiable (and re-run it when idle)
    with open("/proc/loadavg") as f:
        loadavg_start = f.read().split()[:3]
    small = run_at("local[4]", "n4")
    big = run_at("local[16]", "n16")
    ratio = 16 / 4
    out = {
        "loadavg_start": loadavg_start,
        "m_urls": M_URLS,
        "crawl_hosts": CRAWL_HOSTS,
        "small": small,
        "big": big,
        "extract_scaling_efficiency": round(
            (small["extract_sec"] / big["extract_sec"]) / ratio, 3
        ),
        "crawl_scaling_efficiency": round(
            (small["crawl_sec"] / big["crawl_sec"]) / ratio, 3
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
