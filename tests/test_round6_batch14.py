"""Semantics tests for the round-6 batch-14 operators (ml_auc,
stat_jackknife, ts_acf_multi, rec_covisit_topk): parity vs DuckDB is
covered by test_oracle_parity's registry sweep; these pin the math
against independent numpy/pandas replays."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def test_auc_matches_sklearn_style_replay(spark, duck):
    got = REGISTRY["ml_auc"].fn(spark, SF001).collect()[0]
    li = duck.execute(
        "SELECT l_orderkey AS o, l_quantity::BIGINT AS q,"
        " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem"
    ).df()
    train, test = li[li["o"] % 4 < 3], li[li["o"] % 4 == 3]
    model = train.groupby("q")["y"].mean().round(6)
    s = test.join(model.rename("p"), on="q", how="inner")
    y, p = s["y"].to_numpy(), s["p"].to_numpy()
    # midrank AUC == Mann-Whitney U / (n1*n0)
    ranks = pd.Series(p).rank(method="average").to_numpy()
    n1, n0 = int(y.sum()), int((1 - y).sum())
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert got["n_pos"] == n1 and got["n_neg"] == n0
    assert abs(got["auc"] - auc) < 2e-6
    assert 0.0 <= got["auc"] <= 1.0


def test_jackknife_matches_blockwise_replay(spark, duck):
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_jackknife"].fn(spark, SF001).collect()
    }
    li = duck.execute(
        "SELECT l_returnflag AS flag, l_orderkey % 50 AS blk,"
        " l_extendedprice AS p FROM lineitem"
    ).df()
    li["cents"] = np.round(li["p"].to_numpy() * 100).astype(np.int64)
    for flag, g in li.groupby("flag"):
        st, nt = g["cents"].sum(), len(g)
        mbs = []
        for _, gb in g.groupby("blk"):
            mbs.append(
                round((st - gb["cents"].sum()) / 100.0 / (nt - len(gb)), 6)
            )
        b = len(mbs)
        sm, sm2 = sum(mbs), sum(v * v for v in mbs)
        se = math.sqrt(max((b - 1) / b * (sm2 - sm * sm / b), 0.0))
        got = rows[flag]
        assert got["n_blocks"] == b == 50
        assert abs(got["jack_mean"] - st / 100.0 / nt) < 2e-6
        assert abs(got["jack_se"] - se) < 2e-6


def test_acf_matches_numpy_replay(spark, duck):
    got = (
        REGISTRY["ts_acf_multi"].fn(spark, SF001).toPandas()
        .set_index("lag").sort_index()
    )
    ev = duck.execute(
        "SELECT date_trunc('hour', ts) AS h, count(*) AS n"
        " FROM events GROUP BY 1"
    ).df().set_index("h").sort_index()
    x = (
        ev.reindex(
            pd.date_range(ev.index.min(), ev.index.max(), freq="h"),
            fill_value=0,
        )["n"].to_numpy().astype(float)
    )
    n = len(x)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    assert set(got.index) == set(range(1, 25))
    for k in range(1, 25):
        num = ((x[:-k] - mu) * (x[k:] - mu)).sum()
        row = got.loc[k]
        assert row["n_terms"] == n - k
        assert abs(row["acf"] - num / den) < 2e-6


def test_covisit_topk_is_true_topk(spark, duck):
    got = REGISTRY["rec_covisit_topk"].fn(spark, SF001).toPandas()
    pairs = duck.execute(
        """
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part, b.l_partkey AS rec, count(*) AS n
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
        """
    ).df()
    assert (got.groupby("part")["rk"].max() <= 3).all()
    # spot-check 20 anchors: the selected set is the lexicographic top-3
    for part in sorted(got["part"].unique())[:20]:
        cand = pairs[pairs["part"] == part].sort_values(
            ["n", "rec"], ascending=[False, True]
        )
        want = list(cand.head(3)[["rec", "n"]].itertuples(index=False))
        sub = got[got["part"] == part].sort_values("rk")
        have = list(sub[["rec", "n_orders"]].itertuples(index=False))
        assert [tuple(t) for t in have] == [tuple(t) for t in want]
