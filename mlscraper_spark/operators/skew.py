"""Skew mitigation helpers.

First line of defense is AQE (enabled in session.py: skew-join splitting +
partition coalescing) and the crawl's host_bucket design (heavy hosts are
capped by the politeness budget *before* any shuffle).  For joins whose skew
AQE can't split — e.g. an exploded links table joining a per-host dimension
where one host dominates — explicit key salting distributes one hot key
over ``n_salts`` reducers at the cost of replicating the small side.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str, n_salts: int,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side salted.

    The big side gets a deterministic per-row salt (hash of all columns —
    no RNG, so retried tasks produce identical placement); the small side
    is replicated n_salts×.  Result is identical to the unsalted join, but
    one hot key spreads over n_salts shuffle partitions.
    """
    spark = big.sparkSession
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int"),
    )
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    small_replicated = small.crossJoin(F.broadcast(salts))
    joined = big_salted.join(small_replicated, [on, "_salt"], how)
    return joined.drop("_salt")


def salted_count_distinct(df: DataFrame, group_col: str, count_col: str,
                          n_salts: int = 16) -> DataFrame:
    """Two-phase count-distinct for a skewed group key: partial distinct per
    (key, salt), then exact merge — the map-side combine Catalyst can't do
    for distinct aggregates on its own."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(count_col), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.countDistinct(count_col).alias("_partial")
    )
    # distinct values land in exactly one salt bucket (salt = f(value)),
    # so the partial counts are disjoint and sum exactly
    return partial.groupBy(group_col).agg(F.sum("_partial").alias("n_distinct"))
