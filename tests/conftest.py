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
        "Inner-loop lane: pytest -m 'not sweep' (~10 min); full lane "
        "(CI / endgame): plain pytest.",
    )


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
