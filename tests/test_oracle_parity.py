"""The core differential gate: every registered query vs its DuckDB oracle
at sf0.01 — exactly what the driver's t2 check does, but stricter (exact
value equality, no hash)."""

from __future__ import annotations

import pytest

from mapreduce_server_spark import REGISTRY

from .conftest import SF001
from .parity import assert_fetch_dtypes, assert_parity

KEYS = sorted(REGISTRY)


def test_registry_nonempty():
    assert len(REGISTRY) >= 1


@pytest.mark.parametrize("key", KEYS)
def test_parity(spark, duck, key):
    spec = REGISTRY[key]
    df = spec.fn(spark, SF001)
    if spec.oracle is None:
        # driver falls back to a rows-only check for these
        assert df.count() >= 0
        return
    assert_parity(df, duck, spec.oracle, key=key)
    # driver fetch-path twin: catches DuckDB HUGEINT→float64 drift that
    # fetchall()-based value compare cannot see (round-2 concurrency_peak)
    assert_fetch_dtypes(df, duck, spec.oracle, key=key)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
