"""Fixture-drift guard for the events ts loader (VERDICT r5 §next #2).

The driver regenerates ``/root/testdata`` between rounds and the events
timestamp encoding has already changed once (TIMESTAMP(NANOS) →
TIMESTAMP(MICROS)), silently breaking 41 queries. This test writes a tiny
events table in ALL THREE encodings the parquet reader can produce —
int64 nanos (legacy-nanos conf), TIMESTAMP_NTZ (µs, isAdjustedToUTC=false)
and TimestampType (µs, isAdjustedToUTC=true) — and asserts both loader
entry points normalize each to the same TimestampType instants.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from mapreduce_server_spark.sources.loader import (
    TABLE_NAMES,
    load_table,
    load_table_fresh,
)

from .conftest import SF001

# two instants, µs precision, as epoch-µs
US_VALUES = [1_700_000_000_123_456, 1_700_003_600_000_001]


def _write_events(dir_path: str, ts_array: pa.Array) -> str:
    os.makedirs(dir_path, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(dir_path, "events.parquet"))
    return dir_path


@pytest.mark.parametrize(
    "tag,ts_array",
    [
        # TIMESTAMP(NANOS): nanosAsLong conf reads it as int64 → LongType path
        (
            "nanos_int64",
            pa.array([v * 1000 for v in US_VALUES], pa.int64()).cast(
                pa.timestamp("ns")
            ),
        ),
        # TIMESTAMP(MICROS), naive → TIMESTAMP_NTZ path (the current fixture)
        ("micros_ntz", pa.array(US_VALUES, pa.int64()).cast(pa.timestamp("us"))),
        # TIMESTAMP(MICROS), UTC-adjusted → TimestampType pass-through path
        (
            "micros_utc",
            pa.array(US_VALUES, pa.int64()).cast(pa.timestamp("us", tz="UTC")),
        ),
    ],
)
@pytest.mark.parametrize("loader", [load_table, load_table_fresh])
def test_events_ts_normalizes_every_encoding(spark, tmp_path, tag, ts_array, loader):
    d = _write_events(str(tmp_path / tag), ts_array)
    df = loader(spark, d, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("event_id").collect()]
    assert got == US_VALUES


def test_current_fixture_loads_as_timestamp(spark):
    """Whatever encoding the driver last generated, the loaded table must be
    TimestampType and unix_micros must work on it (several oracles use it)."""
    df = load_table(spark, SF001, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.select(F.unix_micros("ts")).first()[0] is not None
    assert "events" in TABLE_NAMES


def test_nanos_conf_pinned_and_harmless_on_micros(spark, tmp_path):
    """The nanosAsLong conf in _RUNTIME_CONFS is drift armor (see the
    loader comment): it must be ACTIVE after any load (so a future
    NANOS-encoded fixture reads as int64 → exact normalization, never a
    lossy auto-cast) AND a no-op on the current micros encodings — the
    micros table must read back identical with the conf pinned on.
    Fences the conf against a "dead conf" cleanup."""
    d = _write_events(
        str(tmp_path / "micros_conf_check"),
        pa.array(US_VALUES, pa.int64()).cast(pa.timestamp("us")),
    )
    df = load_table(spark, d, "events")
    # the loader pinned the conf during the load...
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    # ...and the micros fixture is unaffected by it
    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("event_id").collect()]
    assert got == US_VALUES
