"""Semantics tests for the round-6 batch-13 operators (stat_kendall,
stat_theilsen, stat_bootstrap, ml_calibration, ts_stl, text_zipf):
parity vs DuckDB is covered by test_oracle_parity's registry sweep;
these pin the math against independent numpy/pandas/pure-Python
replays."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def _daily(duck, ycol: str) -> pd.DataFrame:
    return duck.execute(
        f"""
        SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day,
               sum(l_quantity) AS x, sum({ycol}) AS y
        FROM lineitem GROUP BY 1, 2
        """
    ).df()


def test_kendall_matches_pairwise_replay(spark, duck):
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_kendall"].fn(spark, SF001).collect()
    }
    d = _daily(duck, "l_extendedprice")
    for flag, g in d.groupby("flag"):
        # cents-exact integers reproduce the engine's decimal comparisons
        x = np.round(g.sort_values("day")["x"].to_numpy() * 100).astype(np.int64)
        y = np.round(g.sort_values("day")["y"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        iu = np.triu_indices(n, 1)
        prod = dx[iu] * dy[iu]
        c = int((prod > 0).sum())
        disc = int((prod < 0).sum())
        tx = int((dx[iu] == 0).sum())
        ty = int((dy[iu] == 0).sum())
        n0 = n * (n - 1) // 2
        tau = (c - disc) / math.sqrt((n0 - tx) * 1.0 * (n0 - ty))
        got = rows[flag]
        assert got["n_days"] == n and got["n_pairs"] == n0
        assert got["concordant"] == c and got["discordant"] == disc
        assert abs(got["tau_b"] - tau) < 2e-6


def test_theilsen_matches_median_of_slopes(spark, duck):
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_theilsen"].fn(spark, SF001).collect()
    }
    d = _daily(duck, "l_extendedprice")
    for flag, g in d.groupby("flag"):
        g = g.sort_values("day")
        t = g["day"].map(lambda v: v.toordinal()).to_numpy()
        y = g["y"].to_numpy()
        iu = np.triu_indices(len(t), 1)
        slopes = (y[iu[1]] - y[iu[0]]) / (t[iu[1]] - t[iu[0]])
        got = rows[flag]
        assert got["n_pairs"] == len(slopes)
        assert abs(got["sen_slope"] - float(np.median(slopes))) < 2e-6


def _poisson_w(key: str) -> int:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    u = h / 4294967296.0
    cdf, acc, term = [], 0.0, math.exp(-1.0)
    for k in range(10):
        acc += term
        cdf.append(acc)
        term /= k + 1
    return sum(1 for c in cdf if u >= c)


def test_bootstrap_matches_hash_replay(spark, duck):
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_bootstrap"].fn(spark, SF001).collect()
    }
    li = duck.execute(
        "SELECT l_returnflag AS flag, l_orderkey AS o, l_linenumber AS ln,"
        " l_extendedprice AS p FROM lineitem"
    ).df()
    li["cents"] = np.round(li["p"].to_numpy() * 100).astype(np.int64)
    for flag, g in li.groupby("flag"):
        means = []
        keys = [f"{o}-{l}" for o, l in zip(g["o"], g["ln"])]
        cents = g["cents"].to_numpy()
        for rep in range(32):
            w = np.fromiter(
                (_poisson_w(f"boot:{k}:{rep}") for k in keys),
                dtype=np.int64,
            )
            m = (w * cents).sum() / 100.0 / w.sum()
            means.append(round(m, 6))
        b = len(means)
        sm, sm2 = sum(means), sum(v * v for v in means)
        mean = sm / b
        se = math.sqrt(max((sm2 - sm * sm / b) / (b - 1), 0.0))
        got = rows[flag]
        assert got["n_reps"] == 32
        assert abs(got["boot_mean"] - mean) < 2e-6
        assert abs(got["boot_se"] - se) < 2e-6
        # the bootstrap mean should sit near the plain mean
        plain = cents.sum() / 100.0 / len(cents)
        assert abs(mean - plain) < 6 * max(se, 1e-9)


def test_calibration_matches_pandas_replay(spark, duck):
    got = (
        REGISTRY["ml_calibration"].fn(spark, SF001).toPandas()
        .set_index("bin").sort_index()
    )
    li = duck.execute(
        "SELECT l_orderkey AS o, l_quantity::BIGINT AS q,"
        " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem"
    ).df()
    train, test = li[li["o"] % 4 < 3], li[li["o"] % 4 == 3]
    model = train.groupby("q")["y"].mean().round(6)
    s = test.join(model.rename("p"), on="q", how="inner")
    s["bin"] = np.minimum(np.floor(s["p"] * 10).astype(int), 9)
    for b, g in s.groupby("bin"):
        row = got.loc[b]
        assert row["n"] == len(g)
        assert abs(row["mean_pred"] - g["p"].mean()) < 2e-6
        assert abs(row["frac_pos"] - g["y"].mean()) < 2e-6
        assert abs(row["brier"] - ((g["p"] - g["y"]) ** 2).mean()) < 2e-6
    # reliability: predictions in bin b live in [b/10, (b+1)/10)
    for b, row in got.iterrows():
        assert b / 10 - 1e-9 <= row["mean_pred"] <= (b + 1) / 10 + 1e-9


def test_stl_matches_rolling_replay(spark, duck):
    got = REGISTRY["ts_stl"].fn(spark, SF001).toPandas()
    ev = duck.execute(
        "SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n"
        " FROM events GROUP BY 1, 2"
    ).df()
    for etype, g in ev.groupby("event_type"):
        g = g.set_index("h").sort_index()
        full = g.reindex(
            pd.date_range(g.index.min(), g.index.max(), freq="h"),
            fill_value=0,
        )["n"].astype(float)
        sa = full.rolling(24, center=False).sum().shift(-11)
        sb = full.rolling(24, center=False).sum().shift(-12)
        trend = (sa + sb) / 48.0
        det = (full - trend).dropna()
        # the engine's nw=25 rule: keep only rows with full 25-hour frames
        det = det[(det.index >= full.index[12]) & (det.index <= full.index[-13])]
        seasonal = det.groupby(det.index.hour).mean()
        sub = got[got["event_type"] == etype].set_index("hod")
        assert set(sub.index) == set(seasonal.index)
        for hod, want in seasonal.items():
            assert abs(sub.loc[hod, "seasonal"] - want) < 2e-6


def test_zipf_matches_lstsq(spark, duck):
    got = REGISTRY["text_zipf"].fn(spark, SF001).collect()[0]
    texts = [r[0] for r in duck.execute("SELECT text FROM documents").fetchall()]
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([c for _, c in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    # the synthetic corpus vocab (~31 words) is smaller than the top-100
    # cap, so n_words reports the actual vocabulary size
    assert got["n_words"] == len(top)
    assert abs(got["zipf_slope"] - slope) < 1e-5
    assert abs(got["zipf_r2"] - r2) < 1e-5
    assert got["zipf_slope"] < 0  # frequency falls with rank
