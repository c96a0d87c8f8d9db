"""Semantics tests for the round-6 batch-16 operators (ts_backtest,
text_bm25): parity vs DuckDB is covered by test_oracle_parity's
registry sweep; these pin the math against independent replays."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def test_backtest_matches_numpy_replay(spark, duck):
    got = (
        REGISTRY["ts_backtest"].fn(spark, SF001).toPandas()
        .set_index("model")
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
    for model, lagk in (("naive", 1), ("seasonal_naive", 24)):
        err = x[24:] - np.roll(x, lagk)[24:]
        row = got.loc[model]
        assert row["n"] == len(x) - 24
        assert abs(row["mae"] - np.abs(err).mean()) < 2e-6
        assert abs(row["rmse"] - math.sqrt((err**2).mean())) < 2e-6


def test_bm25_matches_pure_python_replay(spark, duck):
    got = REGISTRY["text_bm25"].fn(spark, SF001).toPandas()
    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    k1, b, terms = 1.2, 0.75, ["hash", "join", "scan"]
    dls = {d: len(t.split(" ")) for d, t in docs}
    nd, avgdl = len(docs), sum(dls.values()) / len(docs)
    tfs = {
        d: {w: t.split(" ").count(w) for w in terms if w in t.split(" ")}
        for d, t in docs
    }
    dfs = {w: sum(1 for d in tfs if w in tfs[d]) for w in terms}
    scores = {}
    for d, tf in tfs.items():
        if not tf:
            continue
        s = 0.0
        for w in sorted(tf):  # term-ordered fold, as in the engine
            idf = math.log(1 + (nd - dfs[w] + 0.5) / (dfs[w] + 0.5))
            s += idf * (tf[w] * (k1 + 1)) / (
                tf[w] + k1 * (1 - b + b * dls[d] / avgdl)
            )
        scores[d] = (round(s, 6), len(tf))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert len(got) == 20
    have = list(
        got.sort_values(["score", "doc_id"], ascending=[False, True])[
            ["doc_id", "n_terms", "score"]
        ].itertuples(index=False)
    )
    for (hd, hn, hs), (wd, (ws, wn)) in zip(have, want):
        assert hd == wd and hn == wn
        assert abs(hs - ws) < 2e-6
    # BM25 sanity: all idf weights positive under the +1 variant
    assert (got["score"] > 0).all()


def test_pq_matches_numpy_replay(spark, duck):
    got = (
        REGISTRY["knn_pq"].fn(spark, SF001).toPandas()
        .set_index("vec_id").sort_index()
    )
    emb = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    vecs = {v: np.array(e, dtype=np.float64) for v, e in emb}
    codebook = [vecs[i] for i in range(4)]
    assert len(got) == len(vecs)
    for vid, v in list(vecs.items())[:50]:
        row = got.loc[vid]
        err = 0.0
        for s in range(4):
            sub = v[s * 16 : (s + 1) * 16]
            d6 = [
                round(float(((sub - c[s * 16 : (s + 1) * 16]) ** 2).sum()), 6)
                for c in codebook
            ]
            best = min(range(4), key=lambda j: (d6[j], j))
            assert row[f"code{s}"] == best
            err += d6[best]
        assert abs(row["qerr"] - err) < 2e-6
    # the seed vectors encode themselves with zero error
    for i in range(4):
        assert got.loc[i, "qerr"] == 0.0
        assert all(got.loc[i, f"code{s}"] == i for s in range(4))


def test_anomaly_hours_matches_integer_gate_replay(spark, duck):
    got = REGISTRY["ts_anomaly_hours"].fn(spark, SF001).toPandas()
    ev = duck.execute(
        "SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n"
        " FROM events GROUP BY 1, 2"
    ).df()
    flagged = set()
    for etype, g in ev.groupby("event_type"):
        g = g.set_index("h").sort_index()
        full = g.reindex(
            pd.date_range(g.index.min(), g.index.max(), freq="h"),
            fill_value=0,
        )["n"].astype(int)
        for hod in range(24):
            vals = full[full.index.hour == hod]
            cnt, s, q = len(vals), int(vals.sum()), int((vals**2).sum())
            varn = cnt * q - s * s
            if varn <= 0:
                continue
            for h, x in vals.items():
                dev = cnt * int(x) - s
                if dev * dev > 9 * varn:
                    flagged.add((etype, h))
                    # z² replay
                    row = got[(got["event_type"] == etype) & (got["h"] == h)]
                    assert len(row) == 1
                    assert abs(row["z2"].iloc[0] - dev * dev / varn) < 2e-6
    assert set(zip(got["event_type"], got["h"])) == flagged
    assert len(got) > 0  # the fixture does contain >3-sigma hours
    assert (got["z2"] > 9).all()  # flagged means beyond 3 sigma
