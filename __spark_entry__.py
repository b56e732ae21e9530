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
    """Flagship query: synthesize HTML pages from sf0.001 documents, apply a
    trained-shape scraper plan distributedly, return extracted rows."""
    from mlscraper_spark.queries import q23_extract_scraper

    return q23_extract_scraper(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mlscraper_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mlscraper_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
