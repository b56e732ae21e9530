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
    "q29_ann_ivf",           # IVF ANN (broadcast quantizer, cell join)
]


def _loadavg():
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return None


def _cooldown(threshold: float = 1.5, max_wait: int = 240) -> None:
    """Sleep until the 1-minute loadavg decays below ``threshold`` (or
    ``max_wait`` s elapse).  Each bench section otherwise starts while the
    1-minute average still carries the PREVIOUS section's load (the crawl
    probe's first leg inherited the query loop's ~5+ loadavg in the r3
    judge run), which makes a clean leg look externally confounded in the
    record and hides genuinely confounded ones.  Shared with the scaling
    ladders (scripts/scaling_4m.py imports this)."""
    waited = 0
    while True:
        load = _loadavg()
        if load is None or load < threshold or waited >= max_wait:
            return
        time.sleep(15)
        waited += 15


def main():
    # gate the WHOLE run on a calm host, not just section boundaries: the
    # r4 driver bench started at loadavg 10.7 and read 3x the same-day idle
    # record (BENCH/bench_r4_idle.json) — a loaded-host headline is an
    # artifact, not a measurement.  Wait up to BENCH_COOLDOWN_MAX s (default
    # 10 min) for loadavg < 2; if the host never calms, run anyway but
    # stamp cooldown_met=false so the record is self-identifying.
    cd_max = int(os.environ.get("BENCH_COOLDOWN_MAX", "600"))
    _cooldown(threshold=2.0, max_wait=cd_max)
    load0 = _loadavg()
    cooldown_met = load0 is None or load0 < 2.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = os.environ.get("BENCH_QUERIES")
    names = names.split(",") if names else HEADLINE
    master = os.environ.get("BENCH_MASTER")

    from mlscraper_spark.caches import release_caches
    from mlscraper_spark.queries import QUERIES
    from mlscraper_spark.session import get_spark

    spark = get_spark("mlscraper-spark-bench", master=master)
    # warm the JVM/python workers so startup cost isn't attributed to q1:
    # a JVM-only job alone leaves the Arrow python worker pool cold, and
    # its ~5 s fork+import spin-up was being charged to the first python
    # stage (the crawl probe's canonicalize UDF)
    spark.range(1000).selectExpr("sum(id)").collect()
    _warm_python_workers(spark)

    # best-of-2 per query: the shared sandbox host carries bursty external
    # load that can inflate any single leg 2-4x (see loadavg fields); the
    # min over two runs is the standard noise-robust wall-time estimator
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        legs = []
        for _ in range(2):
            # both legs run cold: queries that .cache() internally would
            # otherwise hand leg 2 a warm cache (CacheManager matches
            # identical plans), which would measure something different
            # from round 1's single cold run; release_caches additionally
            # drops handles clearCache can't reach (localCheckpoint blocks)
            # and empties the scoped registry
            release_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            legs.append(time.time() - t0)
        timings[name] = round(min(legs), 3)

    total = round(sum(timings.values()), 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # BASELINE.json headline metrics: frontier URLs/sec + extraction rows/sec
    urls_per_sec = extract_rows_per_sec = None
    crawl_detail = crawl_extract = None
    if os.environ.get("BENCH_SKIP_THROUGHPUT") != "1":
        _cooldown()  # don't start the crawl probe under the query loop's load
        urls_per_sec, extract_rows_per_sec, crawl_detail = _throughput(spark)
        _cooldown()
        crawl_extract = _crawl_extract_throughput(spark)

    out = {
        "metric": "headline query wall time (lower is better)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "urls_per_sec": urls_per_sec,
        "crawl_probe": crawl_detail,
        "extract_rows_per_sec": extract_rows_per_sec,
        "crawl_extract": crawl_extract,
        "cooldown_met": cooldown_met,
        "master": spark.sparkContext.master,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        # the sandbox host carries unpredictable external load; a 1-minute
        # loadavg >~2 at start inflates every number above (see
        # BENCH/BASELINE.md) — recorded so a noisy round is identifiable
        "loadavg_start": load0,
        "loadavg_end": _loadavg(),
    }
    print(json.dumps(out))
    spark.stop()


def _warm_python_workers(spark):
    """Spin up one Arrow python worker per core (imports pandas/pyarrow in
    each) so per-session interpreter startup isn't measured as query time."""

    def _identity(batches):
        for pdf in batches:
            yield pdf

    n = spark.sparkContext.defaultParallelism
    (spark.range(n * 4).repartition(n)
     .mapInPandas(_identity, "id long").count())


def _throughput(spark):
    """Frontier-processing URLs/sec (2 wide epochs, ~900k-URL BSP crawl) and image-caption
    extraction rows/sec (fused fetch→parse→extract), on the deterministic
    synthetic web."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mlscraper_spark.crawl.engine import CrawlConfig, read_fetch_log, run_crawl
    from mlscraper_spark.crawl.synthweb import WebConfig
    from mlscraper_spark.images.ops import fetch_and_extract_images

    # ~900k URLs over 2 WIDE epochs (100k hosts; links_per_page=10 so the
    # discovery epoch can spend its full budget of 8): epoch width is what
    # amortizes the fixed per-epoch cost — the previous 68k-URL probe sat
    # in the fixed-cost regime and its URLs/s swung 2.4× across identical
    # engines (VERDICT r2), measuring host load instead of the engine.
    # Per-leg seconds + loadavg are reported so a noisy leg is
    # identifiable round-over-round.
    web = WebConfig(n_hosts=100000, max_pages_per_host=40, links_per_page=10)
    # distributed seed source — same URLs as the host_name list
    # comprehension, generated executor-side (no driver list in the task
    # binaries; see seed_crawl's docstring)
    seeds = spark.range(web.n_hosts).select(
        F.format_string("http://host%d.test/page/0", F.col("id")).alias("raw")
    )
    # best-of-2, same rationale as the query loop (fresh root each leg —
    # a reused root would resume, not re-crawl)
    crawl_sec, n_urls = None, None
    crawl_legs, crawl_loads = [], []
    for leg_i in range(2):
        if leg_i:
            _cooldown()  # leg 2 must not inherit leg 1's loadavg
        root = tempfile.mkdtemp(prefix="bench_crawl_")
        crawl_loads.append(_loadavg())
        t0 = time.time()
        run_crawl(spark, root, seeds, web,
                  CrawlConfig(budget_per_host=8, n_buckets=32), max_epochs=2)
        leg = time.time() - t0
        crawl_legs.append(round(leg, 1))
        if crawl_sec is None or leg < crawl_sec:
            crawl_sec = leg
            n_urls = read_fetch_log(spark, root).count()
        shutil.rmtree(root, ignore_errors=True)

    # page counts come from WebConfig itself (literal lookup array), so the
    # bench can never disagree with the web it measures
    ext_web = WebConfig(n_hosts=200, max_pages_per_host=40, links_per_page=4)
    host = F.col("id") % ext_web.n_hosts
    pages_arr = F.array(*[F.lit(ext_web.n_pages(i)) for i in range(ext_web.n_hosts)])
    n_pages = F.element_at(pages_arr, (host + 1).cast("int"))
    urls = spark.range(30000).repartition(128).select(
        F.concat(
            F.lit("http://host"), host.cast("string"), F.lit(".test/page/"),
            (F.col("id") % n_pages).cast("string"),
        ).alias("url_canon")
    )
    extract_sec, n_rows = None, None
    _cooldown()  # the extraction probe follows the crawl probe's last leg
    for _ in range(2):
        t0 = time.time()
        n = fetch_and_extract_images(urls, ext_web).count()
        leg = time.time() - t0
        if extract_sec is None or leg < extract_sec:
            extract_sec, n_rows = leg, n
    return (round(n_urls / crawl_sec, 1), round(n_rows / extract_sec, 1),
            {"n_urls": n_urls, "crawl_legs_sec": crawl_legs,
             "crawl_leg_loadavg": crawl_loads})


def _crawl_extract_throughput(spark):
    """The north_star's FUSED story at bench scale: a trained scraper plan
    applied to every page fetched in each crawl epoch (run_crawl's
    scraper_plan payload stage), measured as extraction rows/sec of total
    crawl wall — inference cost inside the loop, not a separate pass.
    Correctness of the same path is driver-gated by q45 (extraction values
    vs the sequential oracle); this section only times it."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mlscraper_spark.crawl.engine import (
        CrawlConfig,
        read_extractions,
        run_crawl,
    )
    from mlscraper_spark.crawl.synthweb import WebConfig
    from mlscraper_spark.queries import _q45_setup

    _, _, plan = _q45_setup()  # trained plan (pure-python, memoized)
    web = WebConfig(n_hosts=5000, max_pages_per_host=40, links_per_page=10)
    seeds = spark.range(web.n_hosts).select(
        F.format_string("http://host%d.test/page/0", F.col("id")).alias("raw")
    )
    best_sec, n_rows = None, None
    legs, loads = [], []
    for leg_i in range(2):
        if leg_i:
            _cooldown()
        root = tempfile.mkdtemp(prefix="bench_crawl_extract_")
        loads.append(_loadavg())
        t0 = time.time()
        run_crawl(spark, root, seeds, web,
                  CrawlConfig(budget_per_host=8, n_buckets=32),
                  max_epochs=2, scraper_plan=plan)
        leg = time.time() - t0
        legs.append(round(leg, 1))
        if best_sec is None or leg < best_sec:
            best_sec = leg
            n_rows = read_extractions(spark, root).count()
        shutil.rmtree(root, ignore_errors=True)
    return {
        "n_extractions": n_rows,
        "rows_per_sec": round(n_rows / best_sec, 1),
        "legs_sec": legs,
        "leg_loadavg": loads,
    }


if __name__ == "__main__":
    main()
