"""Focused tests for the round-13 optimization internals.

Each optimization that changed HOW an operator computes (never WHAT)
gets a pin here proving the new path is value-identical to the old
formulation it replaced:

- ``fan_out_scan`` (sources/loader.py): conditional round-robin
  repartition — no-op when the scan already splits, multiset-identical
  when it fans out.
- ``functions/vector.py`` dot/norm + stats_ml ``_sq_dist``: the
  FAST_DIM unrolled codegen path must be BIT-identical to the
  interpreted fold it shadows (same ops, same order, same signed
  zeros), including the NULL and wrong-length fallbacks.
- ``dedup_exact``: the struct-min aggregate must reproduce the old
  two-window survivor plan row for row (including the NULL-text group).
- ``knn_mmr._round6``: the driver-side replica of Spark's
  ``round(double, 6)`` must match the engine on ties, negatives and
  binary-noise reprs (the greedy stage moved driver-side this round).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_server_spark.functions.vector import (
    FAST_DIM,
    _dot_fold,
    _norm_fold,
    dot,
    norm,
)
from mapreduce_server_spark.operators.dedup import dedup_exact
from mapreduce_server_spark.operators.similarity import _round6
from mapreduce_server_spark.operators.stats_ml import _sq_dist
from mapreduce_server_spark.sources.loader import Tables, fan_out_scan

from .conftest import SF001


def test_fan_out_scan_fans_single_partition_scan(spark):
    one = spark.range(1000).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    fanned = fan_out_scan(one, spark)
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # multiset-identical: same ids, same count, nothing duplicated
    assert fanned.count() == 1000
    assert fanned.exceptAll(one).count() == 0
    assert one.exceptAll(fanned).count() == 0


def test_fan_out_scan_noop_when_already_split(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target)
    assert fan_out_scan(wide, spark) is wide  # untouched, zero plan nodes
    wider = spark.range(1000).repartition(target + 3)
    assert fan_out_scan(wider, spark) is wider


@pytest.fixture(scope="module")
def emb_pairs(spark):
    """Adjacent-row 64-dim embedding pairs from the committed fixture —
    real float32 payloads, deterministic order."""
    e = Tables(spark, SF001).embeddings.select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("ka"), F.col("embedding").alias("ea"))
    b = e.select(
        (F.col("vec_id") - 1).alias("ka"), F.col("embedding").alias("eb")
    )
    return a.join(b, "ka").cache()


def _bits(col):
    # shortest-decimal rendering distinguishes -0.0 from 0.0 and every
    # distinct double from its neighbours — a bit-identity proxy that
    # stays inside the engine
    return col.cast("string")


def test_dot_fast_path_bit_identical_to_fold(emb_pairs):
    q = emb_pairs.select(
        _bits(dot(F.col("ea"), F.col("eb"))).alias("fast"),
        _bits(_dot_fold(F.col("ea"), F.col("eb"))).alias("fold"),
    )
    assert q.where(~F.col("fast").eqNullSafe(F.col("fold"))).count() == 0


def test_norm_fast_path_bit_identical_to_fold(emb_pairs):
    q = emb_pairs.select(
        _bits(norm(F.col("ea"))).alias("fast"),
        _bits(_norm_fold(F.col("ea"))).alias("fold"),
    )
    assert q.where(~F.col("fast").eqNullSafe(F.col("fold"))).count() == 0


def test_sq_dist_fast_path_bit_identical_to_fold(emb_pairs):
    fold = F.aggregate(
        F.zip_with(
            F.col("ea"), F.col("eb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    q = emb_pairs.select(
        _bits(_sq_dist(F.col("ea"), F.col("eb"))).alias("fast"),
        _bits(fold).alias("fold"),
    )
    assert q.where(~F.col("fast").eqNullSafe(F.col("fold"))).count() == 0


def test_fast_path_fallbacks(spark):
    # wrong length -> general fold; NULL array / NULL element -> NULL
    # exactly like the fold the fast path shadows
    df = spark.createDataFrame(
        [
            ([1.0] * 32, [2.0] * 32),  # not FAST_DIM
            (None, [2.0] * FAST_DIM),  # NULL side
            ([1.0] * FAST_DIM, [None] + [2.0] * (FAST_DIM - 1)),  # NULL elt
        ],
        "a: array<double>, b: array<double>",
    )
    got = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        _dot_fold(F.col("a"), F.col("b")).alias("f"),
    ).collect()
    assert got[0].d == got[0].f == 64.0  # 32 * (1*2)
    assert got[1].d is None and got[1].f is None
    assert got[2].d is None and got[2].f is None


def test_dedup_exact_matches_old_window_formulation(spark):
    new = dedup_exact(spark, SF001)
    d = Tables(spark, SF001).documents
    w = Window.partitionBy("text").orderBy("doc_id")
    old = (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("text")))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars", "n_copies")
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    # the NULL-text rows still collapse to exactly ONE survivor group
    n_null_docs = d.where(F.col("text").isNull()).count()
    if n_null_docs:
        nulls = (
            new.join(
                d.select("doc_id", F.col("text").alias("t")), "doc_id"
            )
            .where(F.col("t").isNull())
            .collect()
        )
        assert len(nulls) == 1
        assert nulls[0].n_copies == n_null_docs


def test_round6_matches_spark_round(spark):
    vals = [
        0.1234565,  # 6-dp tie (half-up, toward +inf for positives)
        -0.1234565,  # negative tie (HALF_UP = away from zero)
        1.0000005,
        0.30000000000000004,  # binary-noise repr (0.1 + 0.2)
        0.1 + 0.2 - 0.3,  # 5.551115123125783e-17
        123456.789012345,
        -9.9999995e-1,
        0.0,
        -0.0,
        2.5e-7,
        1e-30,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x: double")
    got = df.select(F.round(F.col("x"), 6).alias("r")).collect()
    for v, row in zip(vals, got):
        assert _round6(v) == row.r, (v, _round6(v), row.r)
