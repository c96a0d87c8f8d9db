"""Multi-query shared-scan scheduling.

A serving layer that runs the registry's queries one-at-a-time scans the
same fact table once per query. When a batch of queries is known up front
(dashboard refresh, the driver's correctness sweep, a report suite), the
scans can be shared: detect which base tables appear in ≥ ``min_share``
of the batch's plans, pin those scans (`.cache()`), run the batch —
Spark's CacheManager substitutes the in-memory relation into every plan
whose analyzed subtree matches the pinned scan — and unpin.

This is the classic multi-query-optimization reuse (shared scans /
common-subexpression caching, the recurring-workload line in PAPERS.md)
expressed with Spark primitives: no query rewriting, because cache
matching is *structural* on canonicalized analyzed plans — any query
built through ``sources.loader.load_table`` hits the pinned scan for
free.

Scale notes (100 TB): the sharing unit here is the table *scan*, cached
``MEMORY_AND_DISK`` (columnar batches, min/max batch stats → the
in-memory scan still prunes columns and skips batches). At 100 TB one
would not pin a full fact table; the same mechanism applies to the
batch's common *subplan* (e.g. the filtered day partition every
dashboard query starts from) — pin the narrowest shared fragment, which
is exactly what ``table_usage`` + a ``min_share`` threshold lets a
caller choose. Sharing trades one materialization (first query pays the
scan + cache write) for N−1 repeated scans; it wins whenever the
fragment is re-read more than once, and is strictly better than the
driver-side alternative of collecting and re-broadcasting."""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..registry import REGISTRY
from ..sources.loader import TABLE_NAMES, load_table


def tables_referenced(df: DataFrame, sf_dir: str) -> set[str]:
    """Base fixture tables a plan reads, via ``df.inputFiles()`` (the
    public lineage API — robust to aliasing/subqueries; the file path is
    the identity of the scan)."""
    sf = sf_dir.rstrip("/")
    files = df.inputFiles()
    return {
        t
        for t in TABLE_NAMES
        if any(f"{sf}/{t}.parquet" in f for f in files)
    }


def table_usage(dfs: dict[str, DataFrame], sf_dir: str) -> Counter:
    """How many of the batch's plans read each base table."""
    usage: Counter = Counter()
    for df in dfs.values():
        usage.update(tables_referenced(df, sf_dir))
    return usage


@dataclass
class SharedRunReport:
    #: tables pinned for the batch (referenced by ≥ min_share plans)
    shared_tables: list[str] = field(default_factory=list)
    #: per-query: did the executed plan read a pinned in-memory relation?
    used_cache: dict[str, bool] = field(default_factory=dict)
    #: per-query result row counts (for quick sanity display)
    rows: dict[str, int] = field(default_factory=dict)


def run_shared(
    spark: SparkSession,
    sf_dir: str,
    keys: list[str],
    min_share: int = 2,
) -> tuple[dict[str, list], SharedRunReport]:
    """Run a batch of registry queries with shared base-table scans.

    Returns (results, report): results maps query key → collected rows
    (same rows as running each query alone — sharing is semantically
    transparent); the report records what was shared and which executed
    plans actually read the pinned relation (observable as an
    InMemoryTableScan node).
    """
    # the usage probe BUILDS each plan, and for side-effecting queries
    # (sink_*, matview refresh, persisted-index builds — tagged
    # 'side_effects' in the registry) building IS writing: probing them
    # would perform every write twice per batch. They are excluded from
    # scan-share detection (their cost is the write, not a shareable scan)
    # and run once in the execution loop below.
    probe_keys = [k for k in keys if "side_effects" not in REGISTRY[k].tags]
    usage = table_usage(
        {k: REGISTRY[k].fn(spark, sf_dir) for k in probe_keys}, sf_dir
    )
    report = SharedRunReport(
        shared_tables=sorted(t for t, n in usage.items() if n >= min_share)
    )
    pinned = [load_table(spark, sf_dir, t) for t in report.shared_tables]
    for p in pinned:
        p.persist()
    try:
        results: dict[str, list] = {}
        # fresh plans (raw_fn): physical planning must happen AFTER the pin
        # for the CacheManager to substitute the in-memory relation.
        for k in keys:
            df = REGISTRY[k].raw_fn(spark, sf_dir)
            results[k] = df.collect()
            executed = df._jdf.queryExecution().executedPlan().toString()
            report.used_cache[k] = "InMemoryTableScan" in executed
            report.rows[k] = len(results[k])
    finally:
        for p in pinned:
            p.unpersist()
    return results, report
