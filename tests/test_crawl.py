"""Crawl engine vs sequential oracle: bit-for-bit fetch order + URL-seen
equality, politeness, robots, cuckoo filter, and checkpoint/resume
(BASELINE.json north_rule)."""
import shutil

import numpy as np
import pytest

from mlscraper_spark.crawl.cuckoo import CuckooFilter
from mlscraper_spark.crawl.engine import (
    CrawlConfig,
    last_complete_epoch,
    read_fetch_log,
    read_url_seen,
    run_crawl,
)
from mlscraper_spark.crawl.oracle import crawl_oracle
from mlscraper_spark.crawl.synthweb import WebConfig
from mlscraper_spark.crawl.urlnorm import canonicalize, url_hash

WEB = WebConfig(n_hosts=12, max_pages_per_host=40)
SEEDS = WEB.seeds(4)
BUDGET = 2
EPOCHS = 5


@pytest.fixture(scope="module")
def oracle_state():
    return crawl_oracle(SEEDS, WEB, budget_per_host=BUDGET, max_epochs=EPOCHS)


def test_oracle_sanity(oracle_state):
    log = oracle_state.fetch_log
    assert log, "oracle fetched nothing"
    # politeness: no host fetched more than BUDGET times per epoch
    per = {}
    for r in log:
        per[(r["epoch"], r["host"])] = per.get((r["epoch"], r["host"]), 0) + 1
    assert max(per.values()) <= BUDGET
    # no URL fetched twice
    urls = [r["url_canon"] for r in log]
    assert len(urls) == len(set(urls))
    # seq dense per epoch, ordered by the total order
    for epoch in {r["epoch"] for r in log}:
        seqs = [r["seq"] for r in log if r["epoch"] == epoch]
        assert seqs == list(range(len(seqs)))
    # robots: no /private/ URL fetched on disallowing hosts (i % 5 == 2)
    for r in log:
        if "/private/" in r["url_canon"]:
            host_idx = int(r["host"].removeprefix("host").split(".")[0])
            assert host_idx % 5 != 2


def test_oracle_deterministic(oracle_state):
    again = crawl_oracle(SEEDS, WEB, budget_per_host=BUDGET, max_epochs=EPOCHS)
    assert again.fetch_log == oracle_state.fetch_log
    assert again.url_seen == oracle_state.url_seen


def test_engine_matches_oracle(spark, tmp_path, oracle_state):
    root = str(tmp_path / "crawl")
    run_crawl(spark, root, SEEDS, WEB, CrawlConfig(budget_per_host=BUDGET),
              max_epochs=EPOCHS)

    log = [
        (r.epoch, r.seq, r.url_canon, r.host, r.status, r.n_links, r.n_images)
        for r in read_fetch_log(spark, root).sort("epoch", "seq").collect()
    ]
    want = [
        (r["epoch"], r["seq"], r["url_canon"], r["host"], r["status"],
         r["n_links"], r["n_images"])
        for r in oracle_state.fetch_log
    ]
    assert log == want, "fetch order must match the oracle bit-for-bit"

    last = last_complete_epoch(root)
    seen = {r.url_canon for r in read_url_seen(spark, root, last).collect()}
    assert seen == oracle_state.url_seen


def test_engine_resume_equals_uninterrupted(spark, tmp_path, oracle_state):
    root = str(tmp_path / "crawl_resume")
    # run 2 epochs, "kill", resume to EPOCHS
    run_crawl(spark, root, SEEDS, WEB, CrawlConfig(budget_per_host=BUDGET),
              max_epochs=2)
    assert last_complete_epoch(root) == 1
    run_crawl(spark, root, SEEDS, WEB, CrawlConfig(budget_per_host=BUDGET),
              max_epochs=EPOCHS)
    log = [
        (r.epoch, r.seq, r.url_canon)
        for r in read_fetch_log(spark, root).sort("epoch", "seq").collect()
    ]
    want = [(r["epoch"], r["seq"], r["url_canon"]) for r in oracle_state.fetch_log]
    assert log == want
    last = last_complete_epoch(root)
    seen = {r.url_canon for r in read_url_seen(spark, root, last).collect()}
    assert seen == oracle_state.url_seen
    shutil.rmtree(root, ignore_errors=True)


def test_partial_snapshot_is_ignored(tmp_path):
    root = tmp_path / "partial"
    (root / "snap_00003").mkdir(parents=True)  # no manifest → incomplete
    assert last_complete_epoch(str(root)) is None


def test_cuckoo_no_false_negatives():
    flt = CuckooFilter(1 << 10)
    hashes = [url_hash(canonicalize(f"http://h{i % 7}.test/p/{i}")) for i in range(500)]
    assert flt.insert_many(hashes) == 0
    assert flt.contains_many(np.array(hashes, dtype=np.int64)).all()
    other = [url_hash(f"http://other.test/x/{i}") for i in range(2000)]
    fp_rate = flt.contains_many(np.array(other, dtype=np.int64)).mean()
    assert fp_rate < 0.05, f"false positive rate too high: {fp_rate}"


def test_cuckoo_roundtrip():
    flt = CuckooFilter(1 << 8)
    flt.insert_many([1, 2, 3, -5, 1 << 60])
    again = CuckooFilter.from_bytes(flt.to_bytes(), 1 << 8)
    assert again.contains_many(np.array([1, 2, 3, -5, 1 << 60], dtype=np.int64)).all()


def test_cuckoo_blob_carries_config():
    # n_buckets travels in the blob: resuming with a changed filter_buckets
    # fails loudly instead of silently misreshaping the table
    flt = CuckooFilter(1 << 8)
    flt.insert_many([7, 8, 9])
    blob = flt.to_bytes()
    assert CuckooFilter.from_bytes(blob).n_buckets == 1 << 8
    with pytest.raises(ValueError, match="config mismatch"):
        CuckooFilter.from_bytes(blob, 1 << 10)
    with pytest.raises(ValueError, match="CKF1"):
        CuckooFilter.from_bytes(b"garbage-blob")


def test_stray_snapshot_names_ignored(tmp_path):
    # snap_tmp / editor leftovers must not break resume (strict regex)
    root = tmp_path / "stray"
    (root / "snap_tmp").mkdir(parents=True)
    (root / "snap_00001.bak").mkdir()
    assert last_complete_epoch(str(root)) is None


def test_cuckoo_saturation_never_false_negative():
    """Overflow must degrade to maybe-seen-everything, never evict."""
    flt = CuckooFilter(1 << 4)  # 64 slots → guaranteed overflow
    hashes = [url_hash(f"http://h.test/x/{i}") for i in range(500)]
    failed = flt.insert_many(hashes)
    assert failed > 0 and flt.saturated
    assert flt.contains_many(np.array(hashes, dtype=np.int64)).all()
    again = CuckooFilter.from_bytes(flt.to_bytes(), 1 << 4)
    assert again.saturated
    assert again.contains_many(np.array(hashes, dtype=np.int64)).all()
