"""Composite TPC-H-shaped queries (beyond the two flagships) — the
multi-way-join + conditional-aggregation capability evidence.

Each is the fixture-adapted shape of a classic TPC-H query; names cite
which. Scale notes: all dimension chains (region→nation→customer/supplier)
broadcast; the only large shuffles are the fact-table aggregations, which
partial-aggregate first. Money arithmetic uses the exact decimal
discipline throughout (functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import Tables

_REV = "l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(8,2)"


def _rev() -> F.Column:
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (1 - F.col("l_discount")).cast("decimal(8,2)")
    return ep * disc


@query(
    "q5_local_volume",
    category="C.join",
    oracle=f"""
SELECT n_name, sum({_REV})::DOUBLE AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier volume — six-way join where the
    supplier must share the customer's nation; the region→nation→customer
    dimension chain broadcasts, lineitem shuffles once on orderkey."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_items",
    category="C.join",
    oracle=f"""
SELECT c_custkey, c_name, sum({_REV})::DOUBLE AS revenue, max(n_name) AS nation
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '2000-01-01'
  AND o_orderdate <  TIMESTAMP '2000-07-01'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    half-year window (join chain + group + TakeOrderedAndProject)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            t.lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.max("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_class",
    category="D.agg",
    oracle="""
SELECT o_orderpriority,
       sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 1 ELSE 0 END)::BIGINT AS late_count,
       count(*) AS total_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment counts per priority class
    (conditional aggregation over a fact-fact equi-join)."""
    t = Tables(spark, sf_dir)
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    return (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
    )


@query(
    "q14_promo_ratio",
    category="D.agg",
    oracle=f"""
SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                        ELSE 0::DECIMAL(18,2) END)::DOUBLE
       / sum({_REV})::DOUBLE AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
  AND l_shipdate <  TIMESTAMP '2000-02-01'
""",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — ratio of two exact decimal
    sums, so the final double division is engine-identical."""
    t = Tables(spark, sf_dir)
    promo_rev = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-02-01").cast("timestamp"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                100.0 * F.sum(promo_rev).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("promo_pct")
        )
    )
