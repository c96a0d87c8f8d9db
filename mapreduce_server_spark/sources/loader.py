"""Shared table loader — every entry point reads tables through here.

The MapReduce model's input layer is InputFormat/RecordReader over file
splits [MR04 §3.1]; Spark's parquet source subsumes it (splits ≙ partitions,
vectorized reader, predicate pushdown). This module adds the two things the
fixtures need on top of ``spark.read.parquet``:

1. **events nanos fix** (SURVEY.md §1.3): ``events.parquet`` stores
   TIMESTAMP(NANOS), which Spark 4.x refuses to read natively. With
   ``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as int64
   nanos; we truncate to microseconds with *integer* division (``ts div
   1000`` — exact; the data is µs-granular so truncation is lossless) and
   rebuild a proper TimestampType via ``timestamp_micros``.
2. **conf pinning**: the driver calls our queries with *its own*
   SparkSession, which may lack the nanos conf or run in a non-UTC session
   timezone. Both are runtime-settable SQL confs, so we pin them here on
   every load — idempotent, and keeps Spark↔DuckDB timestamp semantics
   aligned (DuckDB treats the naive parquet timestamps as-is; UTC session
   tz makes Spark do the same).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


_CONFS_DONE: set[str] = set()
#: table-scan cache: (applicationId, sf_dir, name) → DataFrame. Scans are
#: immutable plans over read-only paths; caching skips the per-call
#: parquet footer read and schema inference (~80 ms/table).
_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def ensure_confs(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app in _CONFS_DONE:
        return
    for k, v in _RUNTIME_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    _CONFS_DONE.add(app)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; applies the events timestamp normalization."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _SCAN_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            # int64 nanos → µs (exact integer division) → TimestampType.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        _SCAN_CACHE[key] = df
    return df


def load_table_fresh(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Unmemoized variant of :func:`load_table` — a genuinely distinct scan
    lineage each call. Required when a plan COGROUPS a table with itself:
    with both sides sharing one scan, DeduplicateRelations re-aliases the
    right side and column pruning then strips it down to its grouping keys
    (observed under ``count()`` on Spark 4.1 — the right-side pandas frame
    arrives without its payload columns). Distinct lineages sidestep the
    mis-pruning; plain self-JOINs are unaffected."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


class Tables:
    """Attribute-style access to the fixture tables of one scale factor.

    >>> t = Tables(spark, "/root/testdata/sf0.01")
    >>> t.lineitem.join(t.orders, ...)

    Each access is a fresh logical scan (cheap — metadata only); Catalyst
    dedupes/cascades pushdown per query plan, so there is nothing to cache.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load_table(self._spark, self._sf_dir, name)
