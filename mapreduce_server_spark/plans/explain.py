"""Plan introspection — the engine's `.explain` feedback loop as strings.

tests/test_plans.py asserts the physical properties SURVEY.md §4 calls
free-but-verify: predicate pushdown reached the parquet scan, column
pruning narrowed ReadSchema, broadcast joins actually broadcast, top-k
plans TakeOrderedAndProject, aggregation is two-phase (partial+final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    qe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(qe, mode)
