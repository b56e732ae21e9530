"""SparkSession construction with engine defaults.

Tuned for the crawl/extract workload (SURVEY.md §4): AQE on (runtime
re-planning + skew-join splitting for the host-bucketed shuffles), Arrow on
(every non-relational operator is a pandas/Arrow UDF), shuffle partitions
sized for the sandbox but overridable for clusters via normal Spark conf.
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark(app: str = "mlscraper-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    # make the package importable inside python workers (local mode); on a
    # real cluster this is `spark-submit --py-files mlscraper_spark.zip`
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    pypath = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pypath.split(":"):
        os.environ["PYTHONPATH"] = f"{_REPO_ROOT}:{pypath}" if pypath else _REPO_ROOT
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
