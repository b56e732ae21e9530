"""Scoped executor-storage registry shared by the query registry and the
iterative operators.

The driver's parity runner executes every ``queries()`` entry in ONE
SparkSession, so anything a query pins in executor storage (``cache()``d
scans, ``localCheckpoint`` blocks from iterative operators) outlives the
query unless something releases it.  This module is the single place that
tracks those handles: ``scoped_cache``/``register`` record them,
``release_caches()`` — called at every query entry via the
``__spark_entry__`` wrapper and by bench.py between legs — drops them, so a
sequential N-query session holds at most one query's worth of storage.

Handles are anything with ``.unpersist()``: a DataFrame, a pyspark RDD, or
a py4j ``JavaRDD`` (how ``localCheckpoint`` blocks surface — see
operators/neardup.py).
"""
from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

_SCOPED: list[Any] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """``cache()`` whose lifetime is one registry query."""
    df = df.cache()
    _SCOPED.append(df)
    return df


def register(handle: Any) -> None:
    """Track an already-persisted handle (anything with ``.unpersist()``)
    for release at the next ``release_caches()``.

    Used by operators that pin storage through a non-``cache()`` API —
    ``dedup_clusters``'s final-round ``localCheckpoint`` blocks are the
    canonical case: ``DataFrame.unpersist()`` cannot reach them, only the
    underlying RDD handle can."""
    _SCOPED.append(handle)


def release_caches() -> None:
    """Unpersist every handle a previous registry query created (no-op when
    none).  Safe for a plain ``cache()`` while the released plan is still
    lazy — Spark recomputes the subtree if re-executed.  NOT safe to
    re-execute a ``localCheckpoint``-derived plan after release (lineage is
    truncated), which is fine here: the parity runner fully collects each
    query before entering the next."""
    while _SCOPED:
        h = _SCOPED.pop()
        try:
            h.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
