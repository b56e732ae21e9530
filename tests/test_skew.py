"""Skew helpers: salted results must equal their unsalted forms exactly."""
from pyspark.sql import functions as F

from mlscraper_spark.operators.skew import salted_count_distinct, salted_join


def _skewed_df(spark):
    # one hot key (90%), long tail
    return spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 500).cast("string")))
        .alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(500)],
        "k string, weight double",
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
    )
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_distinct_exact(spark):
    df = _skewed_df(spark).withColumn("v", (F.col("payload") % 700).cast("string"))
    plain = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r.k: r.n_distinct
        for r in salted_count_distinct(df, "k", "v", n_salts=16).collect()
    }
    assert plain == salted
