from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_server_spark.session import get_spark  # noqa: E402
from mapreduce_server_spark.sources.loader import TABLE_NAMES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "sweep: full-registry degenerate-fixture parity sweep "
        "(slow — each axis runs ~307 Spark+DuckDB oracle compares). "
        "Deselected by default so a plain `pytest tests/` finishes in "
        "~10 min (the driver-gate lane); the full lane (CI / endgame) "
        "is SPARK_GRAFT_FULL_SUITE=1 pytest tests/ (or -m sweep for "
        "the sweep axes alone).",
    )


def pytest_collection_modifyitems(config, items):
    """Default lane excludes the @pytest.mark.sweep axes (round-14,
    VERDICT r13 #1): the full suite runs ~90-220 min — outside any
    driver verification window — while the non-sweep lane (~10 min,
    ~620 tests) covers every operator, helper and lint. The sweep
    fixtures remain the CI/endgame lane: opt in with
    SPARK_GRAFT_FULL_SUITE=1 or an explicit -m expression."""
    if os.environ.get("SPARK_GRAFT_FULL_SUITE"):
        return
    if config.getoption("-m"):
        return  # explicit marker expression wins (e.g. -m sweep)
    deselected = [it for it in items if it.get_closest_marker("sweep")]
    if not deselected:
        return
    kept = [it for it in items if not it.get_closest_marker("sweep")]
    config.hook.pytest_deselected(items=deselected)
    items[:] = kept


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="mrss-tests", shuffle_partitions=8)
    yield s


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    """DuckDB oracle connection over the sf0.01 fixtures (the driver's t2 SF)."""
    return make_duck(SF001)
