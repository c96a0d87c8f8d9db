"""Aggregations (SURVEY.md §2 cat. D).

MR expression of every query here: shuffle by key then reduce, with the
combiner (partial aggregation) as THE defining optimization [MR04 §4.3].
Spark's HashAggregateExec does partial→Exchange→final automatically — the
plans below never hand-roll two-phase aggregation.

Scale notes: group-by keys here are low-cardinality (flags, dates, types) —
the partial aggregate collapses each map partition to ~|groups| rows before
the shuffle, so the Exchange moves O(partitions × groups) rows no matter the
input size; this shape survives 100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum
from ..registry import query
from ..sources.loader import Tables

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  sum(l_quantity)::DOUBLE                         AS sum_qty,
  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE     AS sum_base_price,
  sum(l_extendedprice::DECIMAL(18,2)
      * (1 - l_discount)::DECIMAL(8,2))::DOUBLE   AS sum_disc_price,
  sum(l_extendedprice::DECIMAL(18,2)
      * (1 - l_discount)::DECIMAL(8,2)
      * (1 + l_tax)::DECIMAL(8,2))::DOUBLE        AS sum_charge,
  sum(l_quantity)::DOUBLE / count(*)              AS avg_qty,
  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE
      / count(*)                                  AS avg_price,
  sum(l_discount::DECIMAL(8,2))::DOUBLE
      / count(*)                                  AS avg_disc,
  count(*)                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=Q1_ORACLE, category="D.agg", tags=("flagship",))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary over lineitem.

    filter → groupBy(flag,status) → multi-measure agg. The canonical
    MapReduce "aggregate per key with combiner" job [MR04 §2.3, §4.3]
    as one declarative plan: Catalyst pushes the shipdate predicate into
    the parquet scan, prunes to the 7 needed columns, and plans
    partial+final hash aggregation around a single Exchange.

    Float discipline: money sums via exact DECIMAL casts (see
    functions/numeric.py); l_quantity is integer-valued so its double sum
    is already exact.
    """
    li = Tables(spark, sf_dir).lineitem
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (1 - F.col("l_discount")).cast("decimal(8,2)")
    tax = (1 + F.col("l_tax")).cast("decimal(8,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(ep * disc).cast("double").alias("sum_disc_price"),
            F.sum(ep * disc * tax).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=2, precision=8).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
