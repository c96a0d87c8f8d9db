"""Text/CSV/JSON ingestion round-trips through the scratch dir."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from mapreduce_server_spark.sources import ingest
from mapreduce_server_spark.sources.loader import load_table

from .conftest import SF001

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "ingest"
)


def setup_module():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)


def test_csv_roundtrip(spark):
    nation = load_table(spark, SF001, "nation")
    path = os.path.join(SCRATCH, "nation_csv")
    nation.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    back = ingest.read_csv(
        spark, path, "n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_json_roundtrip(spark):
    region = load_table(spark, SF001, "region")
    path = os.path.join(SCRATCH, "region_json")
    region.coalesce(1).write.mode("overwrite").json(path)
    back = ingest.read_json(spark, path, "r_regionkey INT, r_name STRING")
    assert sorted(map(tuple, back.select("r_regionkey", "r_name").collect())) == sorted(
        map(tuple, region.collect())
    )


def test_text_with_offsets(spark):
    path = os.path.join(SCRATCH, "lines.txt")
    with open(path, "w") as f:
        f.write("alpha\nbeta\ngamma\n")
    df = ingest.read_text(spark, path, with_offsets=True)
    rows = sorted((r.pos, r.line) for r in df.collect())
    assert rows == [(0, "alpha"), (1, "beta"), (2, "gamma")]


def test_write_partitioned_layout(spark):
    ev = load_table(spark, SF001, "events")
    path = os.path.join(SCRATCH, "events_by_type")
    ingest.write_partitioned(
        ev.select("event_id", "user_id", "event_type"), path, ["event_type"]
    )
    dirs = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert dirs == {f"event_type={t}" for t in ["click", "error", "purchase", "signup", "view"]}
    assert spark.read.parquet(path).count() == ev.count()


def test_loader_rejects_unknown_table(spark):
    import pytest
    from mapreduce_server_spark.sources.loader import load_table

    with pytest.raises(KeyError):
        load_table(spark, SF001, "nonexistent")


def test_csv_failfast_on_malformed(spark):
    import pytest

    path = os.path.join(SCRATCH, "bad.csv")
    os.makedirs(SCRATCH, exist_ok=True)
    with open(path, "w") as f:
        f.write("a,b\n1,2\nnot_an_int,3\n")
    with pytest.raises(Exception):
        ingest.read_csv(spark, path, "a INT, b INT").collect()


def test_compaction_reduces_file_count(spark):
    import os

    from mapreduce_server_spark.operators.sources_ops import (
        COMPACT_TARGET_BYTES,
        sink_dir,
    )
    from mapreduce_server_spark import REGISTRY
    from .conftest import SF001

    REGISTRY["sink_compacted"].fn(spark, SF001).collect()
    frag = sink_dir("compact_frag", SF001)
    compact = sink_dir("compact_out", SF001)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_compact = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    frag_bytes = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    assert n_frag == 64
    assert n_compact == max(1, -(-frag_bytes // COMPACT_TARGET_BYTES))
    assert n_compact < n_frag


def test_orc_roundtrip_with_pushdown(spark):
    """ORC round-trip preserves rows AND the scan supports predicate
    pushdown (PushedFilters in the plan, like parquet stripes)."""
    orders = load_table(spark, SF001, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = os.path.join(SCRATCH, "orders_orc")
    orders.write.mode("overwrite").orc(path)
    back = ingest.read_orc(spark, path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    filtered = back.where("o_orderkey = 42")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan
    assert sorted(map(tuple, filtered.collect())) == sorted(
        map(tuple, orders.where("o_orderkey = 42").collect())
    )


def test_quantize_measures_enforces_quantum(spark):
    """quantize_measures is the ingest-side enforcement of the measure
    quantum contract (ARCHITECTURE §23): after it, every value is exact
    at the quantum — the decimal cast round-trips losslessly — and the
    rounding is the deterministic HALF_UP of the value's shortest
    decimal rendering (Spark's F.round), independent of partitioning."""
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_server_spark.sources.ingest import quantize_measures

    vals = [4132.8949999999995, 0.125, 0.045000000000000005, 1.145,
            -3.675, 17.0, 0.005, 99.994999]
    df = spark.createDataFrame([(v,) for v in vals], "m double")
    got = [r.m for r in quantize_measures(df, ["m"]).orderBy("m").collect()]
    want = sorted(
        float(Decimal(repr(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        for v in vals
    )
    assert got == want
    # non-finite → NULL (NaN at rest is out of contract: its decimal
    # cast throws on both engines); NULL passes through as NULL
    dirty = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (float("-inf"),), (None,), (2.5,)],
        "m double",
    )
    cleaned = [r.m for r in quantize_measures(dirty, ["m"]).collect()]
    assert cleaned.count(None) == 4 and 2.5 in cleaned
    # and the cleaned frame survives the decimal cast that raw NaN crashes
    quantize_measures(dirty, ["m"]).select(
        F.col("m").cast("decimal(18,2)")
    ).collect()
    # at-quantum: the decimal cast is now exact (round-trips losslessly)
    q = quantize_measures(df, ["m"])
    back = q.select(
        F.col("m"), F.col("m").cast("decimal(18,2)").cast("double").alias("rt")
    ).collect()
    assert all(r.m == r.rt for r in back)


def test_measure_contract_validation_at_load(spark, tmp_path, monkeypatch):
    """Round-13 closure of the quantize_measures enforcement gap: the
    load path VALIDATES the §23 contract (opt-in) so a sub-quantum or
    NaN-bearing foreign corpus fails loudly at the first scan instead
    of as dozens of oracle divergences (the ×0.1-probe failure mode)."""
    import duckdb as _duck

    from mapreduce_server_spark.sources import loader

    # the committed fixture satisfies the contract on every measure table
    for t in loader.MEASURE_COLUMNS:
        loader.validate_measure_contract(spark, SF001, t)

    # a drifted regeneration: sub-quantum quantities + one NaN price
    bad = str(tmp_path / "badfix")
    os.makedirs(bad)
    _duck.connect().execute(
        "COPY (SELECT * REPLACE (l_quantity * 0.001 AS l_quantity, "
        "CASE WHEN l_orderkey = 1 THEN 'nan'::DOUBLE ELSE l_extendedprice "
        f"END AS l_extendedprice) FROM read_parquet('{SF001}/lineitem.parquet')"
        f" LIMIT 2000) TO '{os.path.join(bad, 'lineitem.parquet')}'"
        " (FORMAT PARQUET)"
    )
    with pytest.raises(ValueError, match="measure contract"):
        loader.validate_measure_contract(spark, bad, "lineitem")

    # wiring: load_table enforces it only when opted in (bench stays hot)
    monkeypatch.delenv("SPARK_GRAFT_VALIDATE_MEASURES", raising=False)
    loader.load_table(spark, bad, "lineitem")  # no opt-in → no check
    monkeypatch.setenv("SPARK_GRAFT_VALIDATE_MEASURES", "1")
    loader._SCAN_CACHE.clear()
    with pytest.raises(ValueError, match="l_quantity"):
        loader.load_table(spark, bad, "lineitem")
    # and the committed fixture still loads under the opt-in
    loader.load_table(spark, SF001, "lineitem")
    loader._VALIDATED.clear()
    loader._SCAN_CACHE.clear()
