"""URL identity: canonicalization semantics + bit-equality of the pure
Python XXH64 (oracle side) with Spark's xxhash64 (engine side) — the
invariant the whole crawl-order equivalence rests on."""
from pyspark.sql import functions as F

from mlscraper_spark.crawl.urlnorm import canonicalize, host_bucket, url_hash, xxhash64


def test_canonicalize():
    assert canonicalize("HTTP://Host3.TEST:80/a/b?z=1&a=2#frag") == \
        "http://host3.test/a/b?a=2&z=1"
    assert canonicalize("https://EXAMPLE.com") == "https://example.com/"
    assert canonicalize("https://example.com:8443/x") == "https://example.com:8443/x"
    assert canonicalize("http://h.test/p?b=2&a=1&a=0") == "http://h.test/p?a=0&a=1&b=2"
    # idempotent
    u = canonicalize("http://H.test/p/1?x=1#f")
    assert canonicalize(u) == u


def test_xxhash64_matches_spark(spark):
    samples = [
        "", "a", "hello", "http://host3.test/page/7",
        "x" * 31, "y" * 32, "z" * 100, "日本語テキストですよ",
        canonicalize("HTTP://Host9.TEST/page/3?b=2&a=1#x"),
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string").select(
        "s",
        F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(8)).cast("int").alias("b"),
    )
    for row in df.collect():
        assert xxhash64(row.s.encode("utf-8")) == row.h, row.s
        assert host_bucket(row.s, 8) == row.b, row.s


def test_url_hash_is_signed_long():
    h = url_hash("http://host0.test/page/0")
    assert -(1 << 63) <= h < (1 << 63)
