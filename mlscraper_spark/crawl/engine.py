"""The distributed crawl engine: epoch-synchronous BSP loop on DataFrames.

New build per BASELINE.json north_rule — frontier + fetch scheduler with
politeness token buckets, robots cache, partitioned cuckoo URL-seen filter,
priority-queue semantics — matching the sequential oracle (crawl/oracle.py)
bit-for-bit on fetch order and the final URL-seen set.

Design (SURVEY.md §7.4):

* **State lives in epoch snapshots on disk** (parquet dirs with a JSON
  manifest — the Iceberg-snapshot pattern with a format-pluggable fallback).
  Each epoch reads only the previous snapshot, so kill-and-resume is free
  and exact (tested).
* **Politeness** (T6): per-host budget enforced by a window top-k under the
  total order (priority DESC, url_hash ASC, url_canon ASC).
* **Global fetch order**: the same total order across all selected URLs;
  ``seq`` via row_number.  The global window is a single-partition sort of
  ≤ (hosts × budget) rows per epoch — bounded by the politeness budget, not
  by frontier size; at cluster scale swap for sort + zipWithIndex.
* **URL-seen** (P10): per-host_bucket cuckoo filters split candidates into
  "definitely new" (skip the join) and "maybe seen" (exact anti-join
  against url_seen — the ground truth, so filter false positives cost time,
  never correctness).
* **Skew**: everything keyed by ``host_bucket = pmod(xxhash64(host), NB)``;
  AQE skew-join handles residual imbalance.
* **Frontier merge**: per URL keep (MIN depth, MIN discovered_epoch) —
  associative and commutative, so any partitioning yields the oracle's
  result.

No per-row Python on the hot paths: hashing/bucketing/priority/ordering are
JVM expressions; canonicalize + fetch + parse run in Arrow-batched UDFs.
"""
from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mlscraper_spark.crawl.synthweb import WebConfig

FRONTIER_SCHEMA = (
    "url_canon string, url_hash long, host string, host_bucket int, "
    "priority double, depth int, discovered_epoch int"
)
SEEN_SCHEMA = "url_canon string, url_hash long, host_bucket int, seen_epoch int"
FETCHLOG_SCHEMA = (
    "epoch int, seq int, url_canon string, host string, status int, "
    "n_links int, n_images int"
)


@dataclass(frozen=True)
class CrawlConfig:
    budget_per_host: int = 2
    n_buckets: int = 8
    filter_buckets: int = 1 << 12  # cuckoo table size per host_bucket
    fetch_partitions: int = 128  # fetch-stage parallelism (independent of
    # n_buckets: politeness is enforced before the fetch, so any even
    # partitioning is sound; url_hash keying spreads heavy hosts)


def _snap_dir(root: str, epoch: int) -> str:
    # snapshot AFTER epoch e; e = -1 is the seeded initial state
    return os.path.join(root, f"snap_{epoch + 1:05d}")


def _manifest_path(root: str, epoch: int) -> str:
    return os.path.join(_snap_dir(root, epoch), "_manifest.json")


_SNAP_RE = re.compile(r"^snap_(\d{5})$")


def last_complete_epoch(root: str) -> int | None:
    """Largest epoch with a complete snapshot, or None (no seed yet).

    Only strictly-conforming ``snap_NNNNN`` names count — stray entries
    (``snap_tmp``, editor leftovers) are skipped, not a resume-breaking
    ValueError."""
    best = None
    if not os.path.isdir(root):
        return None
    for name in os.listdir(root):
        m = _SNAP_RE.match(name)
        if m:
            e = int(m.group(1)) - 1
            if os.path.exists(_manifest_path(root, e)):
                best = e if best is None else max(best, e)
    return best


def _with_host_bucket(df: DataFrame, cfg: CrawlConfig) -> DataFrame:
    return df.withColumn(
        "host_bucket", F.pmod(F.xxhash64("host"), F.lit(cfg.n_buckets)).cast("int")
    )


def _canonicalize_udf(raw_col: str):
    """Arrow-batched canonicalization (F11): raw href → (url_canon, host, path)."""

    @F.pandas_udf("struct<url_canon:string,host:string,path:string>")
    def _canon(raw: pd.Series) -> pd.DataFrame:
        from urllib.parse import urlsplit

        from mlscraper_spark.crawl.urlnorm import canonicalize

        canons = raw.map(canonicalize)
        return pd.DataFrame(
            {
                "url_canon": canons,
                "host": canons.map(lambda c: urlsplit(c).netloc),
                "path": canons.map(lambda c: urlsplit(c).path),
            }
        )

    return _canon(F.col(raw_col))


def seed_crawl(spark: SparkSession, root: str, seeds: list[str], web: WebConfig,
               cfg: CrawlConfig) -> None:
    """Write the epoch=-1 snapshot: seeded frontier, empty everything else."""
    raw = spark.createDataFrame([(s,) for s in seeds], "raw string")
    c = raw.select(_canonicalize_udf("raw").alias("c")).select("c.*")
    frontier = (
        _with_host_bucket(c, cfg)
        .withColumn("url_hash", F.xxhash64("url_canon"))
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_epoch", F.lit(0))
        .withColumn("priority", F.lit(1.0) / (1.0 + F.col("depth")))
    )
    robots = _robots_rules_df(spark, frontier.select("host").distinct(), 0, web)
    frontier = _filter_robots(frontier, robots).select(
        "url_canon", "url_hash", "host", "host_bucket",
        "priority", "depth", "discovered_epoch",
    ).dropDuplicates(["url_canon"])

    d = _snap_dir(root, -1)
    frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
    spark.createDataFrame([], SEEN_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "url_seen_delta")
    )
    robots.write.mode("overwrite").parquet(os.path.join(d, "robots_delta"))
    spark.createDataFrame(
        [], "host_bucket int, blob binary"
    ).write.mode("overwrite").parquet(os.path.join(d, "filters"))
    with open(_manifest_path(root, -1), "w") as f:
        json.dump({"epoch": -1, "seeds": len(seeds)}, f)


def _robots_rules_df(spark: SparkSession, hosts_df: DataFrame, epoch: int,
                     web: WebConfig) -> DataFrame:
    """S6/J8 robots cache rows for the given hosts (rules are a pure
    function of host — the 'fetch' of robots.txt in the synthetic web)."""

    def _rules(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "rules_json": pdf["host"].map(
                        lambda h: json.dumps(web.robots_disallow(h))
                    ),
                    "fetched_epoch": epoch,
                }
            )

    return hosts_df.select("host").distinct().mapInPandas(
        _rules, "host string, rules_json string, fetched_epoch int"
    )


def _filter_robots(df: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop rows whose path matches a disallow prefix (broadcast join J8)."""
    # coalesce: parse_url yields NULL for URLs java.net.URI rejects; the
    # oracle's urlsplit returns '' there — NULL would nullify exists() and
    # silently drop the row, diverging from the oracle
    with_path = df.withColumn(
        "path",
        F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit("")),
    )
    joined = with_path.join(F.broadcast(robots.select("host", "rules_json")), "host", "left")
    rules = F.from_json(F.coalesce(F.col("rules_json"), F.lit("[]")), "array<string>")
    blocked = F.exists(rules, lambda p: F.col("path").startswith(p))
    return joined.filter(~blocked).drop("path", "rules_json")


def _fetch_udf(web: WebConfig):
    out_schema = T.StructType(
        [
            T.StructField("url_canon", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("host_bucket", T.IntegerType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField("status", T.IntegerType()),
            T.StructField("n_links", T.IntegerType()),
            T.StructField("n_images", T.IntegerType()),
            T.StructField("links", T.ArrayType(T.StringType())),
        ]
    )

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mlscraper_spark.crawl.synthweb import extract_images, extract_links, fetch

        for pdf in batches:
            rows = []
            for url, host, hb, seq, depth in zip(
                pdf["url_canon"], pdf["host"], pdf["host_bucket"], pdf["seq"],
                pdf["depth"],
            ):
                status, html = fetch(url, web)
                links = extract_links(html) if status == 200 else []
                n_images = len(extract_images(html)) if status == 200 else 0
                rows.append(
                    (url, host, int(hb), int(seq), int(depth), status,
                     len(links), n_images, links)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return _fetch, out_schema


def _split_by_filter(cand: DataFrame, filters: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Cuckoo fast path: adds ``maybe_seen`` (False ⇒ definitely new)."""
    cols = cand.columns
    out_schema = ", ".join(f"{c} {t}" for c, t in cand.dtypes) + ", maybe_seen boolean"

    def _check(key, cand_pdfs, filter_pdfs):
        import numpy as np

        from mlscraper_spark.crawl.cuckoo import CuckooFilter

        cand_pdf = cand_pdfs
        blob_rows = filter_pdfs
        if len(blob_rows) and blob_rows["blob"].iloc[0] is not None:
            flt = CuckooFilter.from_bytes(
                bytes(blob_rows["blob"].iloc[0]), cfg.filter_buckets
            )
            maybe = flt.contains_many(cand_pdf["url_hash"].to_numpy(np.int64))
        else:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        cand_pdf = cand_pdf.copy()
        cand_pdf["maybe_seen"] = maybe
        return cand_pdf

    return cand.groupBy("host_bucket").cogroup(
        filters.groupBy("host_bucket")
    ).applyInPandas(_check, out_schema)


def _update_filters(filters: DataFrame, new_hashes: DataFrame,
                    cfg: CrawlConfig) -> DataFrame:
    """Insert this epoch's fetched url_hashes into each bucket's filter."""

    def _upd(key, blob_pdf, hash_pdf):
        import numpy as np

        from mlscraper_spark.crawl.cuckoo import CuckooFilter

        if len(blob_pdf) and blob_pdf["blob"].iloc[0] is not None:
            flt = CuckooFilter.from_bytes(
                bytes(blob_pdf["blob"].iloc[0]), cfg.filter_buckets
            )
        else:
            flt = CuckooFilter(cfg.filter_buckets)
        if len(hash_pdf):
            # sorted insert order → blob bytes (and the manifest's md5
            # fingerprints) are a pure function of the hash SET, not of
            # shuffle arrival order — lineage fingerprints stay comparable
            # across reruns and resume
            flt.insert_many(
                np.sort(hash_pdf["url_hash"].to_numpy(np.int64))
            )
        return pd.DataFrame({"host_bucket": [int(key[0])], "blob": [flt.to_bytes()]})

    return filters.groupBy("host_bucket").cogroup(
        new_hashes.select("host_bucket", "url_hash").groupBy("host_bucket")
    ).applyInPandas(_upd, "host_bucket int, blob binary")


def read_url_seen(spark: SparkSession, root: str, upto_epoch: int) -> DataFrame:
    """Union of the append-only url_seen deltas (Iceberg-snapshot shape)."""
    paths = [
        os.path.join(_snap_dir(root, e), "url_seen_delta")
        for e in range(-1, upto_epoch + 1)
    ]
    return spark.read.schema(SEEN_SCHEMA).parquet(*paths)


ROBOTS_SCHEMA = "host string, rules_json string, fetched_epoch int"


def read_robots(spark: SparkSession, root: str, upto_epoch: int) -> DataFrame:
    """Union of the append-only robots deltas (one row per first-seen host)."""
    paths = [
        p
        for e in range(-1, upto_epoch + 1)
        if os.path.isdir(p := os.path.join(_snap_dir(root, e), "robots_delta"))
    ]
    return spark.read.schema(ROBOTS_SCHEMA).parquet(*paths)


def _assign_global_seq(spark: SparkSession, df: DataFrame, order) -> DataFrame:
    """Deterministic global ``seq`` under a total order, without a
    single-partition window: range-partition by the order keys, rank
    locally, then add per-partition offsets (a tiny collected cumsum).
    A 1M-row epoch showed the naive global row_number costing ~15s of
    *serial* sort per epoch; this form is fully parallel and yields the
    identical sequence (the order keys end in the unique url_canon)."""
    p = max(2, spark.sparkContext.defaultParallelism)
    ranged = df.repartitionByRange(p, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    # localCheckpoint CUTS LINEAGE: RangePartitioner's sampling may draw
    # different bounds on recomputation, which would silently invalidate the
    # offsets collected below; with lineage cut, partition loss fails the
    # epoch (safe — snapshots make retry exact) instead of corrupting seq
    ranked = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .localCheckpoint(eager=True)
    )
    counts = dict(
        (r._pid, r.cnt)
        for r in ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # tiny map → literal CASE expression (broadcast-equivalent)
    off_col = F.lit(0)
    for pid, off in offsets.items():
        off_col = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(off_col)
    return ranked.withColumn(
        "seq", (off_col + F.col("_rn") - 1).cast("int")
    ).drop("_pid", "_rn")


def _trace(label: str, t0: float) -> float:
    import sys
    import time

    t = time.time()
    if os.environ.get("SPARK_GRAFT_TRACE"):
        print(f"[epoch-trace] {label}: {t - t0:.2f}s", file=sys.stderr)
    return t


def run_epoch(spark: SparkSession, root: str, epoch: int, web: WebConfig,
              cfg: CrawlConfig) -> int:
    """Run one BSP epoch; returns number of URLs fetched."""
    import time as _time

    _t = _time.time()
    prev = _snap_dir(root, epoch - 1)
    frontier = spark.read.parquet(os.path.join(prev, "frontier"))
    robots = read_robots(spark, root, epoch - 1)
    filters = spark.read.parquet(os.path.join(prev, "filters"))
    url_seen = read_url_seen(spark, root, epoch - 1)

    # ---- politeness top-k (T6) + global fetch order --------------------
    order = [F.desc("priority"), F.asc("url_hash"), F.asc("url_canon")]
    w_host = Window.partitionBy("host").orderBy(*order)
    selected = (
        frontier.withColumn("rn", F.row_number().over(w_host))
        .filter(F.col("rn") <= cfg.budget_per_host)
        .drop("rn")
    )
    selected = _assign_global_seq(spark, selected, order).cache()
    n_selected = selected.count()
    _t = _trace("select", _t)
    if n_selected == 0:
        selected.unpersist()
        _write_empty_epoch(spark, root, epoch, frontier, robots, filters)
        return 0

    # caches created below are released in the finally block even when a
    # stage throws (long sessions run many crawls)
    _caches = [selected]
    try:
        return _run_epoch_body(
            spark, root, epoch, web, cfg, frontier, robots, filters,
            url_seen, selected, n_selected, _caches, _t,
        )
    finally:
        for df_ in _caches:
            df_.unpersist()


def _run_epoch_body(spark, root, epoch, web, cfg, frontier, robots, filters,
                    url_seen, selected, n_selected, _caches, _t):
    # ---- fetch + parse (S4, Arrow-batched, partitioned by host bucket) --
    fetch_fn, fetch_schema = _fetch_udf(web)
    # 4 waves per core, capped by config — partition count never changes
    # results (politeness is enforced upstream), only task granularity
    n_fetch = min(cfg.fetch_partitions, spark.sparkContext.defaultParallelism * 4)
    fetched = (
        selected.select("url_canon", "url_hash", "host", "host_bucket", "seq", "depth")
        .repartition(n_fetch, "url_hash")
        .drop("url_hash")
        .mapInPandas(fetch_fn, fetch_schema)
        .cache()
    )
    _caches.append(fetched)
    fetched.count()
    _t = _trace("fetch+parse", _t)

    fetch_log = fetched.select(
        F.lit(epoch).alias("epoch"), "seq", "url_canon", "host",
        "status", "n_links", "n_images",
    )

    # ---- discoveries: canonicalize, robots-filter, merge (F11/J8) ------
    raw_links = fetched.select("depth", F.explode("links").alias("raw"))
    disc = raw_links.select(
        (F.col("depth") + 1).alias("depth"), _canonicalize_udf("raw").alias("c")
    ).select("depth", "c.url_canon", "c.host")
    robots_new = _robots_rules_df(
        spark,
        disc.select("host").join(robots.select("host"), "host", "left_anti"),
        epoch + 1,
        web,
    ).cache()
    _caches.append(robots_new)
    robots_all = robots.unionByName(robots_new)
    disc = _filter_robots(disc, robots_all)
    disc = _with_host_bucket(disc, cfg).withColumn(
        "url_hash", F.xxhash64("url_canon")
    ).withColumn("discovered_epoch", F.lit(epoch + 1))

    # ---- url_seen delta + cuckoo update (P10/E5) ------------------------
    seen_delta = selected.select(
        "url_canon", "url_hash", "host_bucket", F.lit(epoch).alias("seen_epoch")
    )
    url_seen_all = url_seen.unionByName(seen_delta)
    # cache: consumed by both the cuckoo split and the snapshot write —
    # without it the blob rebuild cogroup runs twice per epoch
    filters_new = _update_filters(filters, seen_delta, cfg).cache()
    _caches.append(filters_new)

    # ---- frontier merge: (old ∖ fetched) ∪ discoveries, min-rules -------
    cand = (
        frontier.select(
            "url_canon", "url_hash", "host", "host_bucket", "depth",
            "discovered_epoch",
        )
        .unionByName(
            disc.select(
                "url_canon", "url_hash", "host", "host_bucket", "depth",
                "discovered_epoch",
            )
        )
        .groupBy("url_canon")
        .agg(
            F.first("url_hash").alias("url_hash"),
            F.first("host").alias("host"),
            F.first("host_bucket").alias("host_bucket"),
            F.min("depth").alias("depth"),
            F.min("discovered_epoch").alias("discovered_epoch"),
        )
    )
    # cache: both branches below consume the same cuckoo-cogroup output
    flagged = _split_by_filter(cand, filters_new, cfg).cache()
    _caches.append(flagged)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    survived = maybe.join(
        url_seen_all.select("url_canon"), "url_canon", "left_anti"
    )
    frontier_next = definitely_new.unionByName(survived).withColumn(
        "priority", F.lit(1.0) / (1.0 + F.col("depth"))
    ).select(
        "url_canon", "url_hash", "host", "host_bucket", "priority", "depth",
        "discovered_epoch",
    )

    _t = _trace("plan-merge", _t)

    # ---- metrics (A8) ----------------------------------------------------
    metrics = fetched.groupBy("host_bucket").agg(
        F.count(F.lit(1)).alias("n_fetched"),
        F.sum("n_links").alias("n_links"),
        F.sum("n_images").alias("n_images"),
    ).withColumn("epoch", F.lit(epoch))

    # ---- snapshot --------------------------------------------------------
    # independent tables written as CONCURRENT Spark jobs (thread pool);
    # the manifest below is the atomic completion marker, written only
    # after every table commit succeeds, so resume safety is unchanged
    d = _snap_dir(root, epoch)
    writes = [
        (frontier_next, "frontier"),
        (seen_delta, "url_seen_delta"),
        (fetch_log, "fetch_log"),
        (robots_new, "robots_delta"),
        (filters_new, "filters"),
        (metrics, "metrics"),
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(writes)) as pool:
        futs = [
            pool.submit(
                lambda df, name: df.write.mode("overwrite").parquet(
                    os.path.join(d, name)
                ),
                df,
                name,
            )
            for df, name in writes
        ]
        for fut in futs:
            fut.result()  # propagate failures before the manifest exists

    _t = _trace("snapshot-writes", _t)
    fingerprints = {
        str(r.host_bucket): hashlib.md5(bytes(r.blob)).hexdigest()
        for r in spark.read.parquet(os.path.join(d, "filters")).collect()
    }
    with open(_manifest_path(root, epoch), "w") as f:
        json.dump(
            {
                "epoch": epoch,
                "n_fetched": n_selected,
                "filter_fingerprints": fingerprints,
            },
            f,
        )
    _t = _trace("manifest", _t)
    return n_selected


def _write_empty_epoch(spark, root, epoch, frontier, robots, filters):
    d = _snap_dir(root, epoch)
    frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
    spark.createDataFrame([], SEEN_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "url_seen_delta")
    )
    spark.createDataFrame([], FETCHLOG_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "fetch_log")
    )
    spark.createDataFrame([], ROBOTS_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "robots_delta")
    )
    filters.write.mode("overwrite").parquet(os.path.join(d, "filters"))
    with open(_manifest_path(root, epoch), "w") as f:
        json.dump({"epoch": epoch, "n_fetched": 0}, f)


def run_crawl(spark: SparkSession, root: str, seeds: list[str], web: WebConfig,
              cfg: CrawlConfig, max_epochs: int,
              scraper_plan: dict | None = None,
              emit_images: bool = False) -> None:
    """Run (or resume) a crawl up to max_epochs.  Resume is automatic: the
    loop starts after the last complete snapshot, so a killed run continues
    exactly where it stopped (tested identical to an uninterrupted run).

    Optional per-epoch extraction stages (the north-star payload path —
    fetch is a pure function of the URL, so these stages refetch rather
    than persisting raw HTML in snapshots):

    * ``scraper_plan``: apply a trained plan to every page fetched this
      epoch → ``extractions`` table (url_canon, value_json);
    * ``emit_images``: emit the input_hint images table
      (image_id, bytes, w, h, fmt, caption, phash) per epoch.
    """
    last = last_complete_epoch(root)
    if last is None:
        seed_crawl(spark, root, seeds, web, cfg)
        last = -1
    if scraper_plan or emit_images:
        # backfill payload tables for already-complete epochs (a kill can
        # land between the epoch manifest and its payload stages; fetch is
        # a pure function, so re-deriving the payload is exact)
        for e in range(0, last + 1):
            d = _snap_dir(root, e)
            # _SUCCESS is Spark's commit marker: a dir without it is a
            # partial write from a mid-payload kill and must be redone
            def _complete(name):
                return os.path.exists(os.path.join(d, name, "_SUCCESS"))

            missing = (scraper_plan and not _complete("extractions")) or (
                emit_images and not _complete("images")
            )
            if missing and os.path.isdir(os.path.join(d, "fetch_log")):
                _run_payload_stages(spark, root, e, web, scraper_plan,
                                    emit_images)
    for epoch in range(last + 1, max_epochs):
        n = run_epoch(spark, root, epoch, web, cfg)
        if n == 0:
            break
        if n and (scraper_plan or emit_images):
            _run_payload_stages(spark, root, epoch, web, scraper_plan,
                                emit_images)


def _run_payload_stages(spark: SparkSession, root: str, epoch: int,
                        web: WebConfig, scraper_plan: dict | None,
                        emit_images: bool) -> None:
    d = _snap_dir(root, epoch)
    urls = spark.read.parquet(os.path.join(d, "fetch_log")).filter(
        F.col("status") == 200
    ).select("url_canon")
    if scraper_plan:
        from mlscraper_spark.operators.extract import extract_from_urls

        extract_from_urls(urls, scraper_plan, web).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "extractions"))
    if emit_images:
        from mlscraper_spark.images.ops import fetch_and_extract_images

        fetch_and_extract_images(urls, web).write.mode("overwrite").parquet(
            os.path.join(d, "images")
        )


EXTRACTIONS_SCHEMA = "url_canon string, value_json string"


def _read_epoch_tables(spark: SparkSession, root: str, name: str,
                       schema: object) -> DataFrame:
    last = last_complete_epoch(root)
    paths = [
        p
        for e in range(0, (last if last is not None else -1) + 1)
        if os.path.isdir(p := os.path.join(_snap_dir(root, e), name))
    ]
    if not paths:  # nothing written yet → empty frame, not AnalysisException
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def read_images(spark: SparkSession, root: str) -> DataFrame:
    from mlscraper_spark.images.ops import IMAGES_SCHEMA

    return _read_epoch_tables(spark, root, "images", IMAGES_SCHEMA)


def read_extractions(spark: SparkSession, root: str) -> DataFrame:
    return _read_epoch_tables(spark, root, "extractions", EXTRACTIONS_SCHEMA)


def read_fetch_log(spark: SparkSession, root: str) -> DataFrame:
    return _read_epoch_tables(spark, root, "fetch_log", FETCHLOG_SCHEMA)
