"""Iterative graph analytics (the MR-paper workload family MR04 §2.3
lists as link analysis; PageRank is its canonical fixed-point form).

Spark expression: the iteration driver stays in Python, but every
iteration is one declarative plan (broadcast join + partial-aggregated
groupBy) — the loop composes plans, it never touches rows. Two scale
rules demonstrated here:

- **Edges are the invariant** — computed once from the fact tables,
  cached; iterations stream only the O(|V|) rank vector through them.
- **Lineage must be cut** — each iteration's plan nests the last; at
  iteration k the uncut plan is k joins deep and analysis time grows
  superlinearly. ``localCheckpoint`` (or a parquet round-trip on a real
  cluster, where executor loss matters) truncates it periodically.

Determinism: rank values are double sums whose order Spark does not
guarantee, so this op is registered rows-only (no SQL oracle) with a
pytest comparing against a NumPy fixed-point reference at 1e-9 and
checking mass conservation — the documented criterion for iterative
float workloads (SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import Tables

DAMPING = 0.85
N_ITER = 10


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation→nation trade graph: an edge (customer nation →
    supplier nation) weighted by lineitem count. One fact-table join
    chain, aggregated to |V|² ≤ 625 rows — the expensive part, done
    once."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


@query("graph_pagerank", category="J.graph")
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph, 10 fixed
    iterations, damping 0.85. Each iteration: broadcast-join the rank
    vector to the cached edge list, one groupBy(dst) partial-aggregated
    sum, plus the dangling-mass correction (nations with no outgoing
    trade redistribute uniformly) so rank mass is conserved exactly."""
    nations = Tables(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("node")
    )
    n = nations.count()
    edges = trade_edges(spark, sf_dir)
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    # transition probability src→dst (w / total outgoing weight)
    trans = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("wout")).alias("p"))
        .cache()
    )
    trans.count()  # materialize once; iterations reuse

    ranks = nations.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(N_ITER):
        contrib = (
            trans.join(F.broadcast(ranks), F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_mass"))
        )
        # dangling mass: rank held by nodes with no outgoing edges
        dangling = (
            ranks.join(F.broadcast(outw), F.col("node") == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nations.join(contrib, F.col("node") == F.col("dst"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - DAMPING) / n)
                    + F.lit(DAMPING)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        if (i + 1) % 5 == 0:
            # cut lineage: the uncut plan is i joins deep by now
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 9).alias("rank"))
