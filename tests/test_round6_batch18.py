"""Semantics tests for the round-6 batch-18 operators (ml_isotonic,
ts_cross_corr): parity vs DuckDB is covered by test_oracle_parity's
registry sweep; these pin the math against independent replays."""

from __future__ import annotations

import numpy as np
import pandas as pd

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def _pav(y: list[float], w: list[int]) -> list[float]:
    """Textbook pool-adjacent-violators for nondecreasing isotonic fit."""
    blocks = [[yi * wi, wi] for yi, wi in zip(y, w)]  # [sum, weight]
    out: list[list[float]] = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] * out[-1][1] > out[-1][0] * out[-2][1]:
            s, n = out.pop()
            out[-1][0] += s
            out[-1][1] += n
    # expand blocks back to per-bucket values
    fitted = []
    i = 0
    for s, n in out:
        # n is the summed weight; recover how many buckets it covers
        acc = 0
        start = i
        while acc < n - 1e-9:
            acc += w[i]
            i += 1
        fitted.extend([s / n] * (i - start))
    return fitted


def test_isotonic_matches_pav_and_is_monotone(spark, duck):
    got = (
        REGISTRY["ml_isotonic"].fn(spark, SF001).toPandas()
        .sort_values("q").reset_index(drop=True)
    )
    b = duck.execute(
        """
        SELECT l_quantity::BIGINT AS q, count(*) AS n,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        FROM lineitem GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert list(got["q"]) == list(b["q"])
    assert list(got["n"]) == list(b["n"]) and list(got["pos"]) == list(b["pos"])
    rates = (b["pos"] / b["n"]).tolist()
    fitted = _pav(rates, b["n"].tolist())
    for have, want in zip(got["iso_rate"], fitted):
        assert abs(have - want) < 1e-5
    # monotone nondecreasing, clamped to [0, 1]
    iso = got["iso_rate"].to_numpy()
    assert (np.diff(iso) >= -1e-9).all()
    assert (iso >= 0).all() and (iso <= 1).all()
    # isotonic fit preserves the weighted mean (within rounding)
    assert abs((iso * got["n"]).sum() / got["n"].sum()
               - b["pos"].sum() / b["n"].sum()) < 1e-4


def test_cross_corr_matches_numpy_replay(spark, duck):
    got = REGISTRY["ts_cross_corr"].fn(spark, SF001).toPandas()
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
    assert len(got) == len(types) * (len(types) - 1) // 2 * 25
    for _, row in got.sample(60, random_state=0).iterrows():
        a, b = vec[row["type_a"]], vec[row["type_b"]]
        k = int(row["lag"])
        n = len(a)
        ma, mb = a.mean(), b.mean()
        if k >= 0:
            num = ((a[: n - k] - ma) * (b[k:] - mb)).sum()
        else:
            num = ((a[-k:] - ma) * (b[: n + k] - mb)).sum()
        den = np.sqrt(((a - ma) ** 2).sum() * ((b - mb) ** 2).sum())
        assert row["n_terms"] == n - abs(k)
        assert abs(row["ccf"] - num / den) < 2e-6
