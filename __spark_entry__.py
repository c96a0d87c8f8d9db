"""Driver contract for the spark-graft builder (PySpark target).

Thin view over :data:`mapreduce_server_spark.registry.REGISTRY` — every
operator module registers (query fn, oracle SQL) pairs at import time; the
three driver hooks below just re-expose them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_server_spark import REGISTRY  # noqa: E402

FLAGSHIP = "q1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: spec.fn for key, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query key (where expressible)."""
    return {
        key: spec.oracle
        for key, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
