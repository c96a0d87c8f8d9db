"""Semantics tests for the round-6 batch-19 operators (ts_granger,
ml_silhouette): parity vs DuckDB is covered by test_oracle_parity's
registry sweep; these pin the math against independent numpy
replays (the ts_cross_corr lesson: parity alone can't catch a shared
algebra error)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def test_granger_matches_lstsq_replay(spark, duck):
    got = REGISTRY["ts_granger"].fn(spark, SF001).toPandas()
    ev = duck.execute(
        "SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n"
        " FROM events GROUP BY 1, 2"
    ).df()
    lo, hi = ev["h"].min(), ev["h"].max()
    grid = pd.date_range(lo, hi, freq="h")
    vec = {
        t: g.set_index("h")["n"].reindex(grid, fill_value=0).to_numpy(float)
        for t, g in ev.groupby("event_type")
    }
    types = sorted(vec)
    assert len(got) == len(types) * (len(types) - 1)
    for _, row in got.iterrows():
        b, a = vec[row["effect_type"]], vec[row["cause_type"]]
        yv, x1, x2 = b[1:], b[:-1], a[:-1]
        m = len(yv)
        xr = np.column_stack([np.ones(m), x1])
        xu = np.column_stack([np.ones(m), x1, x2])
        wr, *_ = np.linalg.lstsq(xr, yv, rcond=None)
        wu, *_ = np.linalg.lstsq(xu, yv, rcond=None)
        rss_r = ((yv - xr @ wr) ** 2).sum()
        rss_u = ((yv - xu @ wu) ** 2).sum()
        f = (rss_r - rss_u) * (m - 3) / rss_u
        assert row["n_obs"] == m
        assert abs(row["beta"] - wu[2]) < 1e-4
        assert abs(row["f_stat"] - f) < 1e-3
        # F statistics are nonnegative: adding a regressor can't hurt RSS
        assert row["f_stat"] >= -1e-9


def test_silhouette_matches_numpy_replay(spark, duck):
    got = {
        r["label"]: r
        for r in REGISTRY["ml_silhouette"].fn(spark, SF001).collect()
    }
    emb = duck.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    labels = sorted({l for _, l, _ in emb})
    cents = {}
    for lab in labels:
        vs = np.array([e for _, l, e in emb if l == lab], dtype=np.float64)
        cents[lab] = np.round(vs.mean(axis=0), 6)
    sums = {lab: [] for lab in labels}
    for _, lab, e in emb:
        v = np.array(e, dtype=np.float64)
        da = np.sqrt(((v - cents[lab]) ** 2).sum())
        db = min(
            np.sqrt(((v - cents[o]) ** 2).sum())
            for o in labels
            if o != lab
        )
        sums[lab].append(round((db - da) / max(da, db), 6))
    for lab in labels:
        row = got[lab]
        assert row["n"] == len(sums[lab])
        assert abs(row["avg_silhouette"] - sum(sums[lab]) / len(sums[lab])) < 2e-6
        # scores live in [-1, 1]
        assert -1 <= row["avg_silhouette"] <= 1


def test_levene_matches_scipy_style_replay(spark, duck):
    got = REGISTRY["stat_levene"].fn(spark, SF001).collect()[0]
    li = duck.execute(
        "SELECT l_returnflag AS flag, l_extendedprice AS p FROM lineitem"
    ).df()
    groups = []
    for _, g in li.groupby("flag"):
        x = np.sort(g["p"].to_numpy())
        n = len(x)
        med = round((x[(n + 1) // 2 - 1] + x[(n + 2) // 2 - 1]) / 2, 6)
        groups.append(np.abs(g["p"].to_numpy() - med))
    allz = np.concatenate(groups)
    grand = allz.mean()
    k, n = len(groups), len(allz)
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in groups)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k"] == k and got["n"] == n
    assert abs(got["f_stat"] - f) < 1e-4
    assert got["f_stat"] >= 0
