"""Independent replays for round-7 batch 2 (ts_ljungbox,
stat_wilcoxon, rank_hits) — pure numpy / pure Python from
the raw parquet, NOT the engines' shared algebra (the ts_cross_corr
lesson), mirroring each operator's pinned roundings."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def test_ljungbox_matches_numpy(spark):
    hours = duckdb.sql(
        f"""
        SELECT date_trunc('hour', ts) AS h, count(*) AS n
        FROM '{SF001}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    h0, h1 = hours[0][0], hours[-1][0]
    n_slots = int((h1 - h0).total_seconds() // 3600) + 1
    x = np.zeros(n_slots)
    for h, n in hours:
        x[int((h - h0).total_seconds() // 3600)] = n
    n = len(x)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    q = 0.0
    for k in range(1, 13):
        # statsmodels convention, mirrored through the engine's
        # 6-dp rho pinning
        num = ((x[:-k] - mu) * (x[k:] - mu)).sum()
        rho = round(num / den, 6)
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    row = REGISTRY["ts_ljungbox"].fn(spark, SF001).collect()[0]
    assert row["n"] == n
    assert abs(row["q_stat"] - q) < 2e-6, (row["q_stat"], q)
    assert row["reject_iid"] == (q > 21.026)


def test_wilcoxon_matches_pure_python(spark):
    daily = duckdb.sql(
        f"""
        SELECT date_trunc('day', ts) AS d,
               sum(CASE WHEN event_type = 'purchase'
                        THEN value::DECIMAL(18,2) ELSE 0 END) AS sp,
               sum(CASE WHEN event_type = 'view'
                        THEN value::DECIMAL(18,2) ELSE 0 END) AS sv
        FROM '{SF001}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    diffs = [(sp - sv) for _, sp, sv in daily if sp != sv]
    av = sorted(abs(d) for d in diffs)
    # doubled midrank: 2*min_rank + ties - 1
    w2p = w2m = 0
    for d in diffs:
        a = abs(d)
        lo = sum(1 for v in av if v < a)
        ties = sum(1 for v in av if v == a)
        r2 = 2 * (lo + 1) + ties - 1
        if d > 0:
            w2p += r2
        else:
            w2m += r2
    n = len(diffs)
    z = (w2p - n * (n + 1) // 2) / math.sqrt(n * (n + 1) * (2 * n + 1) / 6.0)
    row = REGISTRY["stat_wilcoxon"].fn(spark, SF001).collect()[0]
    assert row["n_days"] == n
    assert row["w2p"] == w2p and row["w2m"] == w2m
    assert abs(row["z"] - z) < 1e-6
    assert row["significant"] == (abs(z) > 1.96)
    # sanity on the rank identity: W+ + W- covers all ranks
    assert w2p + w2m == sum(
        2 * (sum(1 for v in av if v < a) + 1) + sum(1 for v in av if v == a) - 1
        for a in (abs(d) for d in diffs)
    )


def test_hits_matches_numpy(spark):
    edges = duckdb.sql(
        f"""
        SELECT c.c_nationkey, s.s_nationkey, count(*)
        FROM '{SF001}/lineitem.parquet' l
        JOIN '{SF001}/orders.parquet' o ON o_orderkey = l_orderkey
        JOIN '{SF001}/customer.parquet' c ON c_custkey = o_custkey
        JOIN '{SF001}/supplier.parquet' s ON s_suppkey = l_suppkey
        GROUP BY 1, 2
        """
    ).fetchall()
    nodes = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT n_nationkey FROM '{SF001}/nation.parquet'"
        ).fetchall()
    )
    idx = {v: i for i, v in enumerate(nodes)}
    nn = len(nodes)
    w = np.zeros((nn, nn), dtype=object)  # exact integer arithmetic
    for s_, d_, c_ in edges:
        w[idx[s_], idx[d_]] = c_
    h = np.ones(nn, dtype=object)
    for _ in range(2):
        a = w.T @ h
        h = w @ a
    ma, mh = float(max(a)), float(max(h))
    got = {r["node"]: r for r in REGISTRY["rank_hits"].fn(spark, SF001).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v]["authority"] - round(float(a[idx[v]]) / ma, 6)) < 1e-6
        assert abs(got[v]["hub"] - round(float(h[idx[v]]) / mh, 6)) < 1e-6
    # mutual reinforcement sanity: the max-authority node has in-weight
    top = max(nodes, key=lambda v: got[v]["authority"])
    assert w[:, idx[top]].sum() > 0
