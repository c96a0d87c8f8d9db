"""Materialized-view incremental refresh: only new partitions rebuild,
re-refresh is idempotent, and the view equals the direct aggregate."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mapreduce_server_spark.serving.matview import MaterializedView
from mapreduce_server_spark.sources.loader import _normalize_events_ts, ensure_confs

from .conftest import SF001
from .test_streaming import SCRATCH


def _stage(name: str, frac_days: tuple[str, str] | None) -> str:
    """Copy the sf0.001 events into a private dir, optionally truncated to
    ts < cutoff (simulating an append-only log before later days arrive)."""
    src_dir = os.path.join(SCRATCH, f"mv_src_{name}")
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir)
    t = pq.read_table(f"{SF001}/events.parquet")
    if frac_days is not None:
        import pyarrow as pa
        import pyarrow.compute as pc

        lo_ns = int(__import__("pandas").Timestamp(frac_days[0]).value)
        hi_ns = int(__import__("pandas").Timestamp(frac_days[1]).value)
        ts_type = t.schema.field("ts").type
        if pa.types.is_timestamp(ts_type):
            # casting timestamp→int64 yields values in the column's own
            # unit; scale the ns bounds to match (fixture drifted ns→µs)
            div = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[ts_type.unit]
        else:
            div = 1  # nanos-era fixture stored int64 ns directly
        ts = pc.cast(t["ts"], pa.int64())
        t = t.filter(
            pc.and_(
                pc.greater_equal(ts, lo_ns // div), pc.less(ts, hi_ns // div)
            )
        )
    pq.write_table(t, os.path.join(src_dir, "events.parquet"))
    return src_dir


def _mv(name: str) -> MaterializedView:
    def keys(spark, sf_dir):
        ensure_confs(spark)
        ev = _normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
        return ev.select(F.to_date("ts").cast("string").alias("day")).distinct()

    def build(spark, sf_dir, days):
        ensure_confs(spark)
        ev = _normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
        day = F.to_date("ts").cast("string")
        if days is not None:
            ev = ev.filter(day.isin(days))
        return ev.groupBy(day.alias("day"), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

    return MaterializedView(name, "day", keys, build)


def test_incremental_refresh_rebuilds_only_new_days(spark):
    mv = _mv("mv_incr")
    shutil.rmtree(mv.path(os.path.join(SCRATCH, "mv_src_early")), ignore_errors=True)
    shutil.rmtree(mv.path(os.path.join(SCRATCH, "mv_src_full")), ignore_errors=True)

    early = _stage("early", ("2024-01-01", "2024-01-15"))
    built1 = mv.refresh(spark, early)
    assert built1 and all(d < "2024-01-15" for d in built1)

    # the full log arrives at the same logical location: stage it under the
    # early dir's path so the MV storage is continuous
    full = _stage("early", None)
    built2 = mv.refresh(spark, full)
    assert built2 and all(d >= "2024-01-15" for d in built2), built2
    assert not (set(built1) & set(built2))

    # idempotent: nothing new → no work
    assert mv.refresh(spark, full) == []

    got = {
        (r.day, r.event_type): r.n for r in mv.read(spark, full).collect()
    }
    want = {
        (r.day, r.event_type): r.n
        for r in _mv("direct")
        .build(spark, full, None)
        .collect()
    }
    assert got == want


def test_force_rebuilds_dirty_partition(spark):
    mv = _mv("mv_force")
    src = _stage("force", None)
    shutil.rmtree(mv.path(src), ignore_errors=True)
    mv.refresh(spark, src)
    some_day = sorted(mv.materialized_keys(src))[0]
    assert mv.refresh(spark, src, force=[some_day]) == [some_day]


def test_escaped_partition_keys_stay_incremental(spark):
    """Partition values Spark must Hive-escape on disk (':' → '%3A') still
    round-trip through materialized_keys: a second refresh() is a no-op
    instead of rebuilding the escaped partitions forever."""

    def keys(s, d):
        return s.createDataFrame(
            [("2024-01-01T00:00",), ("2024-01-02T06:30",)], ["hour"]
        )

    def build(s, d, hours):
        rows = [("2024-01-01T00:00", 1), ("2024-01-02T06:30", 2)]
        df = s.createDataFrame(rows, ["hour", "n"])
        if hours is not None:
            df = df.filter(F.col("hour").isin(hours))
        return df

    mv = MaterializedView("mv_escape", "hour", keys, build)
    src = os.path.join(SCRATCH, "mv_escape_src")
    shutil.rmtree(mv.path(src), ignore_errors=True)

    assert sorted(mv.refresh(spark, src)) == ["2024-01-01T00:00", "2024-01-02T06:30"]
    # on-disk dirs are escaped; unescaped keys must still match the source
    raw_dirs = {d for d in os.listdir(mv.path(src)) if d.startswith("hour=")}
    assert any("%3A" in d for d in raw_dirs), raw_dirs
    assert mv.refresh(spark, src) == []  # incremental, not a perpetual rebuild


def test_stream_refresh_maintains_view_across_appends(spark):
    """foreachBatch incremental maintenance: the stream supplies the dirty
    days (no discovery scan); a second availableNow run over the same
    checkpoint processes ONLY the appended file and rebuilds only its
    days — including the day split across both files (rebuilt from the
    full source, so the split day's total is still exact)."""
    from mapreduce_server_spark.streaming.twins import events_stream

    def _dir_mv(name):
        def keys(s, d):
            ensure_confs(s)
            ev = _normalize_events_ts(s.read.parquet(d))
            return ev.select(F.to_date("ts").cast("string").alias("day")).distinct()

        def build(s, d, days):
            ensure_confs(s)
            ev = _normalize_events_ts(s.read.parquet(d))
            day = F.to_date("ts").cast("string")
            if days is not None:
                ev = ev.filter(day.isin(days))
            return ev.groupBy(day.alias("day"), "event_type").agg(
                F.count(F.lit(1)).alias("n")
            )

        return MaterializedView(name, "day", keys, build)

    import pyarrow as pa
    import pyarrow.compute as pc
    import pandas as pd

    src_dir = os.path.join(SCRATCH, "mv_stream_src")
    ckpt = os.path.join(SCRATCH, "mv_stream_ckpt")
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(src_dir)
    mv = _dir_mv("mv_stream")
    shutil.rmtree(mv.path(src_dir), ignore_errors=True)

    t = pq.read_table(f"{SF001}/events.parquet")
    ts_type = t.schema.field("ts").type
    if pa.types.is_timestamp(ts_type):
        div = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[ts_type.unit]
    else:
        div = 1  # nanos-era fixture stored int64 ns directly
    ts = pc.cast(t["ts"], pa.int64())
    # mid-day split, in the fixture's own unit (encoding drifted ns→µs)
    cut_ns = int(pd.Timestamp("2024-01-15 12:00:00").value) // div
    pq.write_table(t.filter(pc.less(ts, cut_ns)), os.path.join(src_dir, "a.parquet"))

    key = F.to_date("ts").cast("string")
    log1: list = []
    q = mv.stream_refresh(
        spark, src_dir, events_stream(spark, src_dir), key, ckpt, rebuilt_log=log1
    )
    q.awaitTermination(120)
    assert "2024-01-15" in {d for batch in log1 for d in batch}

    # append the rest; same checkpoint → only the new file is processed
    pq.write_table(
        t.filter(pc.greater_equal(ts, cut_ns)), os.path.join(src_dir, "b.parquet")
    )
    log2: list = []
    q = mv.stream_refresh(
        spark, src_dir, events_stream(spark, src_dir), key, ckpt, rebuilt_log=log2
    )
    q.awaitTermination(120)
    rebuilt2 = {d for batch in log2 for d in batch}
    assert min(rebuilt2) == "2024-01-15", rebuilt2  # split day re-marked dirty
    assert len(rebuilt2) < len(mv.materialized_keys(src_dir))  # not a full rebuild

    got = {(r.day, r.event_type): r.n for r in mv.read(spark, src_dir).collect()}
    want = {
        (r.day, r.event_type): r.n
        for r in _dir_mv("mv_stream_direct").build(spark, src_dir, None).collect()
    }
    assert got == want
