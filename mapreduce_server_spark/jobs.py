"""Generic MapReduce-style job builders over arbitrary DataFrames.

The reference's user surface is "submit a job: a map function and a reduce
function over an input path" [MR04 §2]. These builders are that surface
re-expressed declaratively: each takes any DataFrame (not just the fixture
tables) and returns the job's result plan. The registry operators are
fixture-bound instantiations; these are what a migrating user calls on
their own data.

Every builder is a pure plan-constructor — no execution, no collect —
so Catalyst optimizes the composed pipeline as one query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_count(df: DataFrame, text_col: str, delimiter: str = " ") -> DataFrame:
    """The canonical MR job [MR04 §2.1]: (word, count) per distinct token."""
    return (
        df.select(F.explode(F.split(F.col(text_col), delimiter)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grep(df: DataFrame, pattern: str, *output_cols: str) -> DataFrame:
    """Distributed grep [MR04 §2.3]: rows whose first string column (or
    explicit output columns' source) matches the regex."""
    text_col = output_cols[0] if output_cols else df.columns[0]
    out = df.filter(F.col(text_col).rlike(pattern))
    return out.select(*output_cols) if output_cols else out


def inverted_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """word → sorted posting list [MR04 §2.3]."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.sort_array(F.collect_set(id_col)).alias("postings"))
    )


def total_sort(df: DataFrame, *order: Column) -> DataFrame:
    """TeraSort [MR04 §5.3]: range-partitioned total order."""
    return df.orderBy(*order)


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k without a full sort (TakeOrderedAndProject)."""
    return df.orderBy(*order).limit(k)


def key_value_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """The general MR job shape: shuffle by key, reduce with combiners —
    ``map`` is whatever projection produced ``df``, ``reduce`` is ``aggs``."""
    return df.groupBy(*key_cols).agg(*aggs)


def histogram(df: DataFrame, value_col: str, bucket_width: float) -> DataFrame:
    """Value histogram: floor-bucketing + count (bucket as the key)."""
    bucket = F.floor(F.col(value_col) / bucket_width).cast("long").alias("bucket")
    return df.groupBy(bucket).agg(F.count(F.lit(1)).alias("n"))
