"""Semantics tests for the round-6 batch-17 operators
(ml_markov_stationary, text_chunk): parity vs DuckDB is covered by
test_oracle_parity's registry sweep; these pin the math against
independent numpy/pure-Python replays."""

from __future__ import annotations

import numpy as np

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def test_markov_matches_numpy_power_iteration(spark, duck):
    got = {
        r["event_type"]: r["p_stationary"]
        for r in REGISTRY["ml_markov_stationary"].fn(spark, SF001).collect()
    }
    seq = duck.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    trans: dict[tuple[str, str], int] = {}
    prev_user, prev_type = None, None
    for u, t in seq:
        if u == prev_user:
            trans[(prev_type, t)] = trans.get((prev_type, t), 0) + 1
        prev_user, prev_type = u, t
    types = sorted({f for f, _ in trans} | {t for _, t in trans})
    k = len(types)
    tix = {t: i for i, t in enumerate(types)}
    tm = np.zeros((k, k))
    for f in types:
        row = sum(n for (ff, _), n in trans.items() if ff == f)
        for t in types:
            n = trans.get((f, t), 0)
            if row:
                tm[tix[f], tix[t]] = round(n / row, 6)
    p = np.full(k, 1.0 / k)
    for _ in range(2):
        p = p @ tm
    assert set(got) == set(types)
    for t in types:
        assert abs(got[t] - p[tix[t]]) < 2e-6
    # two row-stochastic steps keep the mass ~1 (only idf rounding lost)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_chunk_matches_pure_python_replay(spark, duck):
    got = REGISTRY["text_chunk"].fn(spark, SF001).toPandas()
    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    n_chunks = 0
    by_doc = {d: g for d, g in got.groupby("doc_id")}
    for doc_id, text in docs:
        toks = text.split(" ")
        n = len(toks)
        want = []
        i = 0
        while True:
            start = i * 48
            if i > 0 and start + 1 > n:
                break
            clen = min(64, n - start)
            want.append((i, start + 1, clen, " ".join(toks[start:start + clen])))
            if start + 64 >= n:
                break
            i += 1
        n_chunks += len(want)
        g = by_doc[doc_id].sort_values("chunk_idx")
        have = list(
            g[["chunk_idx", "start_tok", "chunk_len", "chunk_text"]]
            .itertuples(index=False)
        )
        assert [tuple(t) for t in have] == want
        # overlap invariant: consecutive chunks share 16 tokens
        for (i1, s1, l1, _), (i2, s2, l2, _) in zip(want, want[1:]):
            assert s2 - s1 == 48 and s1 + l1 - s2 == 64 - 48 + (l1 - 64)
    assert len(got) == n_chunks
