"""Shared-scan multi-query scheduling: sharing is detected, observable in
the executed plans, semantically transparent, and cleaned up."""

from __future__ import annotations

from mapreduce_server_spark import REGISTRY
from mapreduce_server_spark.serving import scheduler

from .conftest import SF001

BATCH = ["text_wordcount", "text_token_count", "sample_hash", "agg_group"]


def _rows_alone(spark, key):
    return REGISTRY[key].fn(spark, SF001).collect()


def test_table_usage_counts_plans(spark):
    dfs = {k: REGISTRY[k].fn(spark, SF001) for k in BATCH}
    usage = scheduler.table_usage(dfs, SF001)
    assert usage["documents"] == 3  # wordcount, token_count, sample_hash
    assert usage["orders"] == 1  # agg_group


def test_run_shared_matches_solo_and_uses_cache(spark):
    solo = {k: sorted(map(tuple, _rows_alone(spark, k))) for k in BATCH}
    results, report = scheduler.run_shared(spark, SF001, BATCH, min_share=2)

    assert report.shared_tables == ["documents"]
    for k in BATCH:
        assert sorted(map(tuple, results[k])) == solo[k], k
    # the three documents queries read the pinned in-memory relation …
    assert report.used_cache["text_wordcount"]
    assert report.used_cache["text_token_count"]
    assert report.used_cache["sample_hash"]
    # … the unshared lineitem query does not
    assert not report.used_cache["agg_group"]

    # pin released: a fresh run of a documents query scans parquet again
    df = REGISTRY["text_wordcount"].fn(spark, SF001)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in executed
