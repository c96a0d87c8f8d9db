"""Semantics tests for the round-6 batch-15 operators (ts_dtw,
ml_kfold_cv): parity vs DuckDB is covered by test_oracle_parity's
registry sweep; these pin the math against independent pure-Python
replays."""

from __future__ import annotations

import numpy as np
import pandas as pd

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def _dtw(a: list[int], b: list[int]) -> int:
    """Textbook O(n²) DTW with the standard sequential recurrence."""
    n, m = len(a), len(b)
    inf = float("inf")
    d = [[inf] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            d[i][j] = c + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
    return int(d[n][m])


def test_dtw_matches_textbook_recurrence(spark, duck):
    got = REGISTRY["ts_dtw"].fn(spark, SF001).toPandas()
    prof = duck.execute(
        "SELECT event_type, extract(hour FROM ts)::INT AS hod, count(*) AS n"
        " FROM events GROUP BY 1, 2"
    ).df()
    vecs = {}
    for t, g in prof.groupby("event_type"):
        v = [0] * 24
        for _, r in g.iterrows():
            v[int(r["hod"])] = int(r["n"])
        vecs[t] = v
    assert len(got) == len(vecs) * (len(vecs) - 1) // 2
    for _, row in got.iterrows():
        a, b = vecs[row["type_a"]], vecs[row["type_b"]]
        assert row["dtw"] == _dtw(a, b)
        assert row["l1_dist"] == sum(abs(x - y) for x, y in zip(a, b))
        # warping can only help, and distance is symmetric
        assert row["dtw"] <= row["l1_dist"]
        assert _dtw(b, a) == row["dtw"]


def test_kfold_cv_matches_pandas_replay(spark, duck):
    got = (
        REGISTRY["ml_kfold_cv"].fn(spark, SF001).toPandas()
        .set_index("fold").sort_index()
    )
    li = duck.execute(
        "SELECT l_orderkey % 4 AS fold, l_quantity::BIGINT AS q,"
        " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem"
    ).df()
    assert set(got.index) == {0, 1, 2, 3}
    for f in range(4):
        train, test = li[li["fold"] != f], li[li["fold"] == f]
        model = train.groupby("q")["y"].mean().round(6)
        s = test.join(model.rename("p"), on="q", how="inner")
        pred = (s["p"] > 0.5).astype(int)
        acc = float((pred == s["y"]).mean())
        row = got.loc[f]
        assert row["n"] == len(s)
        assert abs(row["accuracy"] - acc) < 2e-6
    # a majority-class-rate sanity floor: accuracy beats random coin
    assert (got["accuracy"] > 0.5).all()


def test_permtest_matches_hash_replay(spark, duck):
    import hashlib

    got = REGISTRY["stat_permtest"].fn(spark, SF001).collect()[0]
    li = duck.execute(
        "SELECT l_orderkey AS o, l_linenumber AS ln, l_extendedprice AS p,"
        " l_returnflag AS f FROM lineitem"
    ).df()
    cents = np.round(li["p"].to_numpy() * 100).astype(np.int64)
    is_a = (li["f"] == "R").to_numpy()
    obs = round(
        cents[is_a].sum() / 100.0 / is_a.sum()
        - cents[~is_a].sum() / 100.0 / (~is_a).sum(),
        6,
    )
    assert got["n_a"] == int(is_a.sum()) and got["n_b"] == int((~is_a).sum())
    assert abs(got["obs_diff"] - obs) < 2e-6
    keys = [f"{o}-{l}" for o, l in zip(li["o"], li["ln"])]
    n_ge = 0
    for rep in range(32):
        g = np.fromiter(
            (
                int(hashlib.md5(f"perm:{k}:{rep}".encode()).hexdigest()[:8], 16)
                % 2
                for k in keys
            ),
            dtype=np.int64,
        ).astype(bool)
        dr = round(
            abs(
                cents[g].sum() / 100.0 / g.sum()
                - cents[~g].sum() / 100.0 / (~g).sum()
            ),
            6,
        )
        if dr >= abs(obs):
            n_ge += 1
    assert got["n_perms"] == 32 and got["n_ge"] == n_ge
    assert abs(got["p_value"] - (n_ge + 1) / 33) < 2e-6


def test_weighted_sample_is_true_topk_and_weight_biased(spark, duck):
    import hashlib
    import math

    got = REGISTRY["sample_weighted"].fn(spark, SF001).toPandas()
    li = duck.execute(
        "SELECT l_orderkey AS o, l_linenumber AS ln,"
        " l_quantity::BIGINT AS q FROM lineitem"
    ).df()
    scores = []
    for o, l, q in zip(li["o"], li["ln"], li["q"]):
        h = int(hashlib.md5(f"ws:{o}-{l}".encode()).hexdigest()[:8], 16)
        scores.append((math.log((h + 1) / 4294967297.0) / q, o, l, q))
    scores.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scores[:100]
    assert len(got) == 100
    have = list(
        got.sort_values(["score", "l_orderkey", "l_linenumber"],
                        ascending=[False, True, True])
        [["l_orderkey", "l_linenumber", "qty"]].itertuples(index=False)
    )
    assert [tuple(t) for t in have] == [(o, l, q) for _, o, l, q in want]
    # E-S property: the sample over-represents heavy rows
    assert got["qty"].mean() > li["q"].mean()
