"""Skew-mitigation evidence: on a synthetically skewed join key (90% of
probe rows share one key), salting provably (a) preserves results and
(b) bounds the largest shuffle group — the property that decides whether
a 100 TB join finishes or one straggler reducer runs for hours.

Deterministic assertions only (group-size distributions, not wall
times): the hot key's probe rows must spread across all S salt shards,
each within a small factor of the mean shard size."""

from __future__ import annotations

from pyspark.sql import functions as F

S = 8
N_PROBE = 200_000
HOT_FRACTION = 0.9


def _skewed_frames(spark):
    # probe: 90% of rows hit key 0, rest spread over 1..999
    probe = spark.range(N_PROBE).select(
        F.when(
            (F.col("id") % 10) < int(HOT_FRACTION * 10), F.lit(0)
        )
        .otherwise((F.col("id") % 999) + 1)
        .alias("k"),
        (F.col("id") % 1000).alias("payload"),
    )
    build = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dim")
    )
    return probe, build


def test_salted_join_bounds_group_sizes_and_preserves_result(spark):
    probe, build = _skewed_frames(spark)

    # unsalted: the hot key concentrates 90% of probe rows in ONE group
    unsalted_max = (
        probe.groupBy("k").count().agg(F.max("count")).first()[0]
    )
    assert unsalted_max >= HOT_FRACTION * N_PROBE

    # salted: deterministic salt from the payload spreads the hot key
    p = probe.withColumn("salt", (F.col("payload") % S).cast("int"))
    shard_counts = [
        r["count"]
        for r in p.where(F.col("k") == 0).groupBy("salt").count().collect()
    ]
    assert len(shard_counts) == S  # hot key present in every shard
    mean = sum(shard_counts) / S
    assert max(shard_counts) <= 1.5 * mean  # no shard re-concentrates

    # and the rewrite is result-transparent
    b = build.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    salted = (
        p.join(b, ["k", "salt"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s"))
    )
    plain = (
        probe.join(build, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_aqe_splits_skewed_join(spark):
    """With AQE skew thresholds scaled down to fixture sizes, Spark's
    runtime re-plan must split the skewed probe-side shuffle read
    ('AQEShuffleRead … skewed' in the final plan) — the automatic
    counterpart of the manual salt, and the config that handles it at
    real scale. forceOptimizeSkewedJoin is needed here because the plan
    is consumed by collect(); with a downstream shuffle AQE would skip
    the split rather than add an exchange (worth knowing at scale:
    join→aggregate pipelines fall back to manual salting or the force
    flag)."""
    probe, build = _skewed_frames(spark)
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ path
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = probe.join(build, "k").select("k", "dim", "payload")
        df.collect()  # AQE finalizes the plan during execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
