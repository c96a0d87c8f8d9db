"""Independent replays for the scale-technique operators (sketches
re-verified in pure Python with hashlib — the ts_cross_corr lesson:
oracle parity can't catch a formula bug when both engines share the
algebra) plus structural assertions that the physical technique itself
engaged (salting really shuffles, the bloom really prunes)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
from pyspark.sql import functions as F

from mapreduce_server_spark.operators.scale_patterns import (
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_W,
    SALT_N,
)
from mapreduce_server_spark.registry import REGISTRY
from mapreduce_server_spark.sources.loader import Tables

from .conftest import SF001


def _h(prefix: str, key: int, mod: int) -> int:
    return int(hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:8], 16) % mod


def test_cms_matches_pure_python_sketch(spark):
    ev = duckdb.sql(
        f"SELECT user_id FROM '{SF001}/events.parquet'"
    ).fetchall()
    users = [r[0] for r in ev]
    # build the sketch independently
    cells = [Counter() for _ in range(CMS_D)]
    for u in users:
        for d in range(CMS_D):
            cells[d][_h(f"cms{d}:", u, CMS_W)] += 1
    truth = Counter(users)
    got = {
        r["user_id"]: r
        for r in REGISTRY["sketch_cms"].fn(spark, SF001).collect()
    }
    probe_set = {u for u in truth if u % 100 == 0}
    assert set(got) == probe_set and probe_set
    for u in probe_set:
        est = min(cells[d][_h(f"cms{d}:", u, CMS_W)] for d in range(CMS_D))
        assert got[u]["est"] == est, u
        assert got[u]["true_n"] == truth[u], u
        # the CMS guarantee: never an undercount
        assert got[u]["overcount"] >= 0, u


def test_bloom_matches_pure_python_and_never_false_negative(spark):
    members = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT o_custkey FROM '{SF001}/orders.parquet' "
            "WHERE o_orderstatus = 'F'"
        ).fetchall()
    }
    custs = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM '{SF001}/customer.parquet'"
        ).fetchall()
    ]
    bits = {
        _h(f"bm{k}:", m, BLOOM_M) for m in members for k in range(BLOOM_K)
    }
    expect = Counter(
        (
            all(_h(f"bm{k}:", c, BLOOM_M) in bits for k in range(BLOOM_K)),
            c in members,
        )
        for c in custs
    )
    got = {
        (r["in_bloom"], r["is_member"]): r["n"]
        for r in REGISTRY["sketch_bloom"].fn(spark, SF001).collect()
    }
    assert got == dict(expect)
    # structural bloom guarantee: a member never misses
    assert (False, True) not in got


def test_salted_join_shuffles_and_matches_plain(spark):
    df = REGISTRY["join_skew_salted"].fn(spark, SF001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, "merge hint did not take - dim was broadcast"
    t = Tables(spark, SF001)
    plain = (
        t.lineitem.join(
            t.supplier, F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))
    # the salt fan-out really replicates the dim SALT_N times
    assert SALT_N == 16


def test_bloom_semi_prunes_before_exact_join(spark):
    t = Tables(spark, SF001)
    dim = t.customer.filter(
        (F.col("c_nationkey") == 3) & (F.col("c_acctbal") > 5000)
    ).select("c_custkey")
    n_dim = dim.count()
    n_orders = t.orders.count()
    # replicate just the prefilter stage: it must pass every true match
    # and drop the bulk of the fact side
    members = {r[0] for r in dim.collect()}
    bits = {
        _h(f"bf{k}:", m, BLOOM_M) for m in members for k in range(BLOOM_K)
    }
    custkeys = [r[0] for r in t.orders.select("o_custkey").collect()]
    passed = [
        c
        for c in custkeys
        if all(_h(f"bf{k}:", c, BLOOM_M) in bits for k in range(BLOOM_K))
    ]
    true_matches = sum(1 for c in custkeys if c in members)
    assert true_matches <= len(passed) < n_orders
    assert n_dim > 0
    # end result equals the plain semi-join aggregate
    plain = (
        t.orders.join(
            F.broadcast(dim),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )
    got = REGISTRY["join_bloom_semi"].fn(spark, SF001)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )
