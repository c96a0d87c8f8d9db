"""Independent replays for round-7 batch 4 (text_substring_dup,
ts_kalman) — pure Python/numpy from the raw parquet."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def test_substring_dup_matches_pure_python(spark):
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF001}/documents.parquet'"
    ).fetchall()
    grams: list[tuple[str, str]] = []
    n_docs: Counter = Counter()
    for src, text in docs:
        n_docs[src] += 1
        toks = text.split(" ")
        for i in range(len(toks) - 7):
            grams.append(
                (src, hashlib.md5(" ".join(toks[i : i + 8]).encode()).hexdigest())
            )
    counts = Counter(h for _, h in grams)
    per_src: dict[str, list[int]] = {}
    for src, h in grams:
        a = per_src.setdefault(src, [0, 0])
        a[0] += 1
        a[1] += 1 if counts[h] >= 2 else 0
    got = {
        r["source"]: r
        for r in REGISTRY["text_substring_dup"].fn(spark, SF001).collect()
    }
    assert set(got) == set(per_src)
    for src, (tot, dup) in per_src.items():
        r = got[src]
        assert r["n_docs"] == n_docs[src]
        assert r["total_windows"] == tot
        assert r["dup_windows"] == dup
        assert abs(r["dup_ratio"] - round(dup / tot, 6)) < 1e-6
    # the tiny shared vocabulary makes 8-gram collisions real: non-zero
    # duplication must be detected somewhere
    assert any(a[1] > 0 for a in per_src.values())


def test_kalman_matches_pure_python(spark):
    rows = duckdb.sql(
        f"""
        SELECT user_id, value FROM '{SF001}/events.parquet'
        ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    series: dict[int, list[float]] = {}
    for u, v in rows:
        series.setdefault(u, []).append(float(v))
    got = {r["user_id"]: r for r in REGISTRY["ts_kalman"].fn(spark, SF001).collect()}
    assert set(got) == set(series)
    q, r_noise = 1.0, 4.0
    for u, xs in series.items():
        m, p = xs[0], 1.0
        for x in xs[1:]:
            pm = p + q
            gain = pm / (pm + r_noise)
            m = m + gain * (x - m)
            p = (1.0 - gain) * pm
        assert got[u]["n_events"] == len(xs)
        assert got[u]["level_filtered"] == m, u  # bit-exact fold
        assert got[u]["p_last"] == p, u
    # the gain actually adapted: p approaches the steady state
    # p* = (sqrt(17) - 1) / 2 ~ 1.5616 (solves p = (1-K)(p+q) for
    # q=1, r=4) from its 1.0 prior for any long-enough series
    p_star = (17**0.5 - 1) / 2
    multi = [u for u, xs in series.items() if len(xs) > 10]
    assert multi and all(abs(got[u]["p_last"] - p_star) < 1e-6 for u in multi)


def test_stream_topk_matches_pure_python(spark):
    rows = duckdb.sql(
        f"""
        SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT, user_id
        FROM '{SF001}/events.parquet'
        """
    ).fetchall()
    per_win: dict[int, Counter] = {}
    for ws, u in rows:
        per_win.setdefault(ws, Counter())[u] += 1
    expect = set()
    for ws, cnt in per_win.items():
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (u, n) in enumerate(top, 1):
            expect.add((ws, u, n, rk))
    got = {
        (r["ws_s"], r["user_id"], r["n"], r["rk"])
        for r in REGISTRY["stream_topk"].fn(spark, SF001).collect()
    }
    assert got == expect


def test_pipeline_shuffle_is_deterministic_and_balanced(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF001}/documents.parquet'"
    ).fetchall()
    shards: dict[int, list] = {}
    for doc_id, src in docs:
        sh = int(
            hashlib.md5(f"shard:{doc_id}".encode()).hexdigest()[:8], 16
        ) % 8
        shards.setdefault(sh, []).append(
            (hashlib.md5(f"shuf:{doc_id}".encode()).hexdigest(), doc_id, src)
        )
    got = {
        r["shard"]: r
        for r in REGISTRY["pipeline_shuffle"].fn(spark, SF001).collect()
    }
    assert set(got) == set(shards)
    n_total = 0
    for sh, items in shards.items():
        items.sort()
        r = got[sh]
        assert r["n_docs"] == len(items)
        assert r["last_pos"] == len(items)
        assert r["first_doc"] == items[0][1]
        assert r["n_sources"] == len({s for _, _, s in items})
        n_total += len(items)
    assert n_total == len(docs)
    # hash sharding balances: no shard more than 2x the mean
    mean = n_total / 8
    assert all(len(v) < 2 * mean for v in shards.values())
    # the shuffle decorrelates sources: every shard mixes many sources
    assert all(got[sh]["n_sources"] >= 10 for sh in shards)


def test_reconcile_flags_planted_drift_exactly(spark):
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice::DECIMAL(18,2) FROM '{SF001}/orders.parquet'"
    ).fetchall()
    # independent replay of the block diff
    fa: dict[int, list] = {}
    fb: dict[int, list] = {}
    for k, p in rows:
        blk = k % 64
        h = int(hashlib.md5(f"rc:{k}|{p}".encode()).hexdigest()[:8], 16)
        fa.setdefault(blk, [0, 0])
        fa[blk][0] += 1
        fa[blk][1] += h
        if k % 997 == 13:
            continue  # lost in the replica
        p2 = p + 1 if k % 997 == 500 else p
        h2 = int(hashlib.md5(f"rc:{k}|{p2}".encode()).hexdigest()[:8], 16)
        fb.setdefault(blk, [0, 0])
        fb[blk][0] += 1
        fb[blk][1] += h2
    got = {
        r["blk"]: r
        for r in REGISTRY["quality_reconcile"].fn(spark, SF001).collect()
    }
    assert set(got) == set(fa)
    statuses = Counter()
    for blk, (ca, ha) in fa.items():
        cb, hb = fb.get(blk, (0, 0))
        if ca != cb:
            want = "count_mismatch"
        elif ha != hb:
            want = "content_mismatch"
        else:
            want = "ok"
        assert got[blk]["status"] == want, blk
        assert got[blk]["cnt_a"] == ca and got[blk]["cnt_b"] == cb, blk
        statuses[want] += 1
    # the planted drift is visible AND bounded: some blocks flagged,
    # most clean
    assert statuses["count_mismatch"] >= 1
    assert statuses["content_mismatch"] >= 1
    assert statuses["ok"] > statuses["count_mismatch"] + statuses["content_mismatch"]


def test_changepoint_matches_numpy(spark):
    import numpy as np

    days = duckdb.sql(
        f"""
        SELECT date_trunc('day', ts) AS d, count(*) AS x
        FROM '{SF001}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    d0 = days[0][0]
    n_slots = (days[-1][0] - d0).days + 1
    x = np.zeros(n_slots)
    for d, cnt in days:
        x[(d - d0).days] = cnt
    s, n = x.sum(), len(x)
    best = None
    for k in range(1, n):  # split after position k (1-indexed prefix)
        sl, nl = x[:k].sum(), k
        sr, nr = s - sl, n - k
        red = round(sl * sl / nl + sr * sr / nr - s * s / n, 6)
        if best is None or red > best[0]:
            best = (red, k, sl, sr)
    red, k, sl, sr = best
    row = REGISTRY["ts_changepoint_binseg"].fn(spark, SF001).collect()[0]
    assert row["n_pre"] == k and row["n_post"] == n - k
    assert abs(row["reduction"] - red) < 2e-6
    assert abs(row["mean_pre"] - round(sl / k, 6)) < 1e-6
    assert abs(row["mean_post"] - round(sr / (n - k), 6)) < 1e-6
    # the two segment means really differ at the chosen split
    assert row["mean_pre"] != row["mean_post"]
