"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship distributed-extraction query at sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry
(mlscraper_spark/queries.py) — one entry per implemented operator family
from SURVEY.md §2 plus the training-data-pipeline operators, each with a
DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()
_ZIP_PATH: str | None = None


def _build_zip() -> str:
    """Fresh per-process zip in a private temp dir: never reuses a stale,
    truncated, or attacker-pre-created file at a predictable path."""
    global _ZIP_PATH
    if _ZIP_PATH is None:
        import tempfile

        d = tempfile.mkdtemp(prefix="mlscraper_spark_pkg_")
        path = os.path.join(d, "mlscraper_spark.zip")
        with zipfile.ZipFile(path, "w") as zf:
            pkg = os.path.join(_REPO, "mlscraper_spark")
            for base, _, files in os.walk(pkg):
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(base, fn)
                        zf.write(full, os.path.relpath(full, _REPO))
        _ZIP_PATH = path
    return _ZIP_PATH


def _ship_package(spark: SparkSession) -> None:
    """Make mlscraper_spark importable inside python workers regardless of
    how the session was built (the spark-submit --py-files pattern, applied
    programmatically)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(_build_zip())  # failures must surface
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query — the graft's hot path: HTML pages flow through
    Arrow UDFs emitting (image_id, bytes→n_bytes, w, h, fmt, caption, phash)
    image rows (BASELINE.json input_hint), at sf0.001."""
    from pyspark.sql import functions as F

    from mlscraper_spark.images.ops import extract_images_table
    from mlscraper_spark.queries import _doc_image_pages

    _ship_package(spark)
    images = extract_images_table(_doc_image_pages(spark, "/root/testdata/sf0.001"))
    return images.select(
        "image_id", "w", "h", "fmt", "caption", "phash",
        F.length("bytes").alias("n_bytes"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mlscraper_spark.queries import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from mlscraper_spark.queries import release_caches

            _ship_package(spark)
            # the driver's parity runner executes the whole registry in one
            # SparkSession: drop whatever the previous query left cached so
            # storage memory stays bounded at one query's working set
            release_caches()
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from mlscraper_spark.queries import LAZY_ORACLE_SQL, ORACLE_SQL

    out = dict(ORACLE_SQL)
    # lazy oracles (q45 trains a scraper + replays the sequential crawl
    # oracle to build a VALUES literal) are materialized only when the
    # parity gate actually asks for SQL
    out.update({name: build() for name, build in LAZY_ORACLE_SQL.items()})
    return out
