"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship distributed-extraction query at sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry
(mlscraper_spark/queries.py) — one entry per implemented operator family
from SURVEY.md §2 plus the training-data-pipeline operators, each with a
DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query — the graft's hot path: HTML pages flow through
    Arrow UDFs emitting (image_id, bytes→n_bytes, w, h, fmt, caption, phash)
    image rows (BASELINE.json input_hint), at sf0.001."""
    from pyspark.sql import functions as F

    from mlscraper_spark.images.ops import extract_images_table
    from mlscraper_spark.queries import _doc_image_pages

    images = extract_images_table(_doc_image_pages(spark, "/root/testdata/sf0.001"))
    return images.select(
        "image_id", "w", "h", "fmt", "caption", "phash",
        F.length("bytes").alias("n_bytes"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mlscraper_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mlscraper_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
