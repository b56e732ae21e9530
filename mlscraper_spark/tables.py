"""TableFormat seam — pluggable storage for the crawl's snapshot tables.

The north_rule mandates "Iceberg tables"; this sandbox has no Iceberg jars
(SURVEY.md §7), so the engine writes/reads through this one indirection:

* ``IcebergSnapshotFormat`` — used automatically when the Iceberg Spark
  runtime is on the classpath (probed once per session);
* ``ParquetSnapshotFormat`` — the fallback: plain parquet directories with
  the engine's epoch-snapshot manifest as the commit protocol (same schema,
  same bucketing, same append-only-delta semantics).

``engine.py`` contains no direct ``.parquet(`` calls; dropping Iceberg jars
onto a real cluster flips every crawl table to Iceberg without touching the
epoch loop.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableFormat:
    """Write/read one logical table at a path (or several paths — the
    append-only tables are unions of per-epoch deltas), plus the two
    probes the epoch loop needs: ``exists`` (was this table ever
    written?) and ``is_complete`` (did its write COMMIT?).  Keeping the
    probes behind the seam is what lets the Iceberg variant drop in
    without touching the loop — parquet's ``_SUCCESS`` marker is a
    parquet detail, not an engine concept."""

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, paths: list[str], schema=None) -> DataFrame:
        raise NotImplementedError

    def read_stream(self, spark: SparkSession, path: str, schema=None,
                    max_files_per_trigger: int | None = None) -> DataFrame:
        """Structured-streaming source over one table path/glob (the
        append-only tables stream naturally: new epoch deltas appear as
        new commits/files and flow through incrementally)."""
        raise NotImplementedError

    def exists(self, spark: SparkSession, path: str) -> bool:
        raise NotImplementedError

    def is_complete(self, spark: SparkSession, path: str) -> bool:
        raise NotImplementedError


class ParquetSnapshotFormat(TableFormat):
    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(path)

    def read(self, spark: SparkSession, paths: list[str], schema=None) -> DataFrame:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*paths)

    def read_stream(self, spark: SparkSession, path: str, schema=None,
                    max_files_per_trigger: int | None = None) -> DataFrame:
        reader = spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(path)

    def exists(self, spark: SparkSession, path: str) -> bool:
        import os

        return os.path.isdir(path)

    def is_complete(self, spark: SparkSession, path: str) -> bool:
        # _SUCCESS is the Hadoop committer's atomic marker: present iff
        # every task of the write committed
        import os

        return os.path.exists(os.path.join(path, "_SUCCESS"))


class IcebergSnapshotFormat(TableFormat):
    """Iceberg-backed variant (requires iceberg-spark-runtime on the
    classpath and a configured catalog).  Snapshot dirs become Iceberg
    table partitions; the epoch manifest maps onto Iceberg snapshot ids.
    Not exercisable in this sandbox — constructed only when the probe
    below finds the runtime.  ``read`` ignores the schema argument by
    design: an Iceberg table carries its own (evolvable) schema."""

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        df.write.format("iceberg").mode(mode).save(path)

    def read(self, spark: SparkSession, paths: list[str], schema=None) -> DataFrame:
        dfs = [spark.read.format("iceberg").load(p) for p in paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def exists(self, spark: SparkSession, path: str) -> bool:
        try:
            spark.read.format("iceberg").load(path).schema
            return True
        except Exception:
            return False

    def read_stream(self, spark: SparkSession, path: str, schema=None,
                    max_files_per_trigger: int | None = None) -> DataFrame:
        # Iceberg's incremental streaming source; schema comes from the
        # table, rate limiting from streaming options
        reader = spark.readStream.format("iceberg")
        if max_files_per_trigger is not None:
            reader = reader.option("streaming-max-files-per-micro-batch",
                                   max_files_per_trigger)
        return reader.load(path)

    def is_complete(self, spark: SparkSession, path: str) -> bool:
        # Iceberg writes are atomic at the snapshot level: a loadable
        # table IS a committed table
        return self.exists(spark, path)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


_OVERRIDE: TableFormat | None = None


def get_table_format(spark: SparkSession) -> TableFormat:
    # probed per call: the Class.forName round-trip costs ~1 ms and a
    # cache keyed by session identity can go stale (id() reuse after GC)
    if _OVERRIDE is not None:
        return _OVERRIDE
    return (
        IcebergSnapshotFormat() if iceberg_available(spark)
        else ParquetSnapshotFormat()
    )


class use_table_format:
    """Context manager injecting a TableFormat for everything under it —
    how the fake-format contract test proves the epoch loop touches
    storage ONLY via the seam, and how a deployment could force a
    specific format regardless of the classpath probe."""

    def __init__(self, fmt: TableFormat):
        self._fmt = fmt

    def __enter__(self):
        global _OVERRIDE
        self._prev = _OVERRIDE
        _OVERRIDE = self._fmt
        return self._fmt

    def __exit__(self, *exc):
        global _OVERRIDE
        _OVERRIDE = self._prev
        return False
