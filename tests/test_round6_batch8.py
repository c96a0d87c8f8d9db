"""Semantics tests for the round-6 batch-8 operators (stat_anova,
stat_spearman, ml_dtree_stump, win_ntile, udf_pandas_iter): parity vs
DuckDB is covered by test_oracle_parity's registry sweep; these pin the
math against independent numpy/pandas/pure-Python replays."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def test_anova_matches_numpy(spark, duck):
    row = REGISTRY["stat_anova"].fn(spark, SF001).collect()[0]
    d = duck.execute("SELECT source, n_chars FROM documents").fetchnumpy()
    groups = [
        d["n_chars"][d["source"] == s].astype(float)
        for s in set(d["source"])
    ]
    allv = np.concatenate(groups)
    grand = allv.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n"] == n
    assert abs(row["ss_between"] - ssb) < 1e-3
    assert abs(row["ss_within"] - ssw) < 1e-3
    assert abs(row["f_stat"] - f) < 1e-6


def test_spearman_matches_pandas(spark, duck):
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_spearman"].fn(spark, SF001).collect()
    }
    li = duck.execute(
        "SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem"
    ).df()
    for flag, g in li.groupby("l_returnflag"):
        # average-method ranks == midranks; Pearson over them == rho
        rx = g["l_quantity"].rank(method="average")
        ry = g["l_extendedprice"].rank(method="average")
        rho = np.corrcoef(rx, ry)[0, 1]
        got = rows[flag]
        assert got["n"] == len(g)
        assert abs(got["rho"] - rho) < 1e-6


def test_dtree_stump_is_true_argmin(spark, duck):
    got = REGISTRY["ml_dtree_stump"].fn(spark, SF001).collect()[0]
    d = duck.execute("SELECT n_chars, lang FROM documents").df()
    x = d["n_chars"].to_numpy()
    y = (d["lang"] == "en").to_numpy()
    n = len(x)

    def weighted_gini(thr: int) -> float:
        left = x <= thr
        nl, nr = int(left.sum()), int((~left).sum())
        pl, pr = int(y[left].sum()), int(y[~left].sum())
        gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        return nl * gl + nr * gr

    def purity(thr: int) -> float:
        # the engine's 6-dp-rounded argmax criterion (purity form)
        left = x <= thr
        nl, nr = int(left.sum()), int((~left).sum())
        pl, pr = int(y[left].sum()), int(y[~left].sum())
        ql, qr = nl - pl, nr - pr
        return round(
            ((pl * pl + ql * ql) * nr + (pr * pr + qr * qr) * nl)
            / (nl * nr),
            6,
        )

    cands = sorted(set(x))[:-1]
    best = max(cands, key=lambda t: (purity(t), -t))
    assert got["threshold"] == best
    left = x <= best
    assert got["n_left"] == int(left.sum())
    assert got["n_right"] == n - int(left.sum())
    assert got["pred_left"] == (2 * int(y[left].sum()) > int(left.sum()))
    # purity is the n − wg/(nl·nr) rearrangement of weighted Gini
    nl, nr = int(left.sum()), n - int(left.sum())
    wg = weighted_gini(best)
    assert abs((n - got["purity"]) - wg) < 1e-4


def test_ntile_fill_rule(spark, duck):
    rows = REGISTRY["win_ntile"].fn(spark, SF001).collect()
    n_by_type = dict(
        duck.execute(
            "SELECT event_type, count(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["tile"])
        assert [r["tile"] for r in rs] == [1, 2, 3, 4]
        total = n_by_type[t]
        # ANSI fill: first (total mod 4) tiles get one extra row
        base, extra = divmod(total, 4)
        assert [r["n"] for r in rs] == [
            base + (1 if i < extra else 0) for i in range(4)
        ]
        # value ranges are non-decreasing across tiles
        for a, b in zip(rs, rs[1:]):
            assert a["lo"] <= a["hi"] <= b["lo"] + 1e-9
            assert a["lo"] <= a["avg_value"] <= a["hi"]


def test_pandas_iter_matches_python_replay(spark, duck):
    got = {
        r["doc_id"]: r["n_alpha_tokens"]
        for r in REGISTRY["udf_pandas_iter"].fn(spark, SF001).collect()
    }
    pat = re.compile(r"[a-z]+")
    for doc_id, text in duck.execute(
        "SELECT doc_id, text FROM documents LIMIT 100"
    ).fetchall():
        want = sum(1 for w in text.split(" ") if pat.fullmatch(w))
        assert got[doc_id] == want


def test_ridge_matches_numpy(spark, duck):
    row = REGISTRY["ml_ridge_normal"].fn(spark, SF001).collect()[0]
    li = duck.execute(
        "SELECT l_quantity, l_discount, l_extendedprice FROM lineitem"
    ).fetchnumpy()
    X = np.column_stack(
        [np.ones(len(li["l_quantity"])), li["l_quantity"], li["l_discount"]]
    )
    y = li["l_extendedprice"]
    lam = 1000.0
    A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])  # intercept unpenalized
    w = np.linalg.solve(A, X.T @ y)
    assert row["n"] == len(y)
    assert abs(row["w0"] - w[0]) < 1e-3
    assert abs(row["w1"] - w[1]) < 1e-4
    assert abs(row["w2"] - w[2]) < 1e-2


def test_sax_words(spark, duck):
    rows = REGISTRY["ts_sax"].fn(spark, SF001).collect()
    n_users = duck.execute(
        "SELECT count(*) FROM (SELECT user_id FROM events"
        " GROUP BY 1 HAVING count(*) >= 8)"
    ).fetchone()[0]
    assert len(rows) == n_users
    for r in rows:
        assert len(r["sax"]) == 8
        assert set(r["sax"]) <= set("abcd")
    # z-scored PAA words cannot ALL be one flat symbol corpus-wide
    assert len({r["sax"] for r in rows}) > 1


def test_item_cosine_bounds(spark, duck):
    rows = REGISTRY["rec_item_cosine"].fn(spark, SF001).collect()
    assert rows, "expected at least one pair with support >= 2"
    for r in rows:
        assert 0.0 < r["cosine"] <= 1.0 + 1e-9
        assert r["n_both"] >= 2
        assert r["part_a"] < r["part_b"]
    # cross-check one pair against a direct DuckDB recount
    r0 = max(rows, key=lambda r: (r["n_both"], r["part_a"]))
    ca, cb, nb = duck.execute(
        """
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT (SELECT count(*) FROM op WHERE l_partkey = ?),
               (SELECT count(*) FROM op WHERE l_partkey = ?),
               (SELECT count(*) FROM (
                  SELECT l_orderkey FROM op WHERE l_partkey = ?
                  INTERSECT
                  SELECT l_orderkey FROM op WHERE l_partkey = ?))
        """,
        [r0["part_a"], r0["part_b"], r0["part_a"], r0["part_b"]],
    ).fetchone()
    assert r0["n_both"] == nb
    assert abs(r0["cosine"] - nb / (ca * cb) ** 0.5) < 1e-6


def test_bpe_pair_python_replay(spark, duck):
    got = [
        (r["pair"], r["n"])
        for r in REGISTRY["text_bpe_pair"].fn(spark, SF001).collect()
    ]
    from collections import Counter

    vocab: Counter = Counter()
    for (text,) in duck.execute("SELECT text FROM documents").fetchall():
        for w in text.split(" "):
            if len(w) >= 2:
                vocab[w] += 1
    pairs: Counter = Counter()
    for w, freq in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += freq
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def test_percent_rank_definition(spark, duck):
    rows = REGISTRY["win_percent_rank"].fn(spark, SF001).collect()
    df = duck.execute(
        "SELECT event_id, event_type, value FROM events"
    ).df()
    for r in rows[:50]:
        g = df[df["event_type"] == r["event_type"]]["value"]
        n = len(g)
        below = int((g < r["value"]).sum())
        at_or_below = int((g <= r["value"]).sum())
        assert abs(r["pct_rank"] - below / (n - 1)) < 1e-8
        assert abs(r["cume_dist"] - at_or_below / n) < 1e-8


def test_perplexity_python_replay(spark, duck):
    import math
    from collections import Counter

    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_perplexity"].fn(spark, SF001).collect()
    }
    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    train = [t for i, t in docs if (i // 20) % 2 == 0]
    test = [(i, t) for i, t in docs if (i // 20) % 2 == 1]
    bg: Counter = Counter()
    vocab = set()
    for t in train:
        w = t.split(" ")
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            bg[(a, b)] += 1
    heads: Counter = Counter()
    for (a, _), c in bg.items():
        heads[a] += c
    v = len(vocab)
    scorable = [(i, t) for i, t in test if len(t.split(" ")) >= 2]
    assert len(rows) == len(scorable)
    for doc_id, t in scorable[:20]:
        w = t.split(" ")
        terms = [
            math.log((bg[(a, b)] + 1) / (heads[a] + v))
            for a, b in zip(w, w[1:])
        ]
        s = 0.0
        for x in terms:  # left fold, matching the engine discipline
            s += x
        nll = -s / len(terms)
        got = rows[doc_id]
        assert got["n_bigrams"] == len(terms)
        assert abs(got["avg_nll"] - nll) < 1e-5
        assert abs(got["perplexity"] - math.exp(nll)) < 1e-2
        assert got["perplexity"] > 1.0


def test_tree_depth2_refines_stump(spark, duck):
    stump = REGISTRY["ml_dtree_stump"].fn(spark, SF001).collect()[0]
    leaves = {
        r["leaf"]: r
        for r in REGISTRY["ml_tree_depth2"].fn(spark, SF001).collect()
    }
    t1 = stump["threshold"]
    assert set(leaves) == {"L", "R"}
    # child split thresholds live strictly inside their leaf's range
    assert leaves["L"]["threshold"] < t1
    assert leaves["R"]["threshold"] > t1
    # leaf populations re-partition the root's
    assert (
        leaves["L"]["n_left"] + leaves["L"]["n_right"] == stump["n_left"]
    )
    assert (
        leaves["R"]["n_left"] + leaves["R"]["n_right"] == stump["n_right"]
    )
    # replay the R leaf's best split in python
    d = duck.execute("SELECT n_chars, lang FROM documents").df()
    x = d["n_chars"].to_numpy()
    y = (d["lang"] == "en").to_numpy()
    xr, yr = x[x > t1], y[x > t1]

    def purity(thr):
        left = xr <= thr
        nl, nr = int(left.sum()), int((~left).sum())
        pl, pr = int(yr[left].sum()), int(yr[~left].sum())
        ql, qr = nl - pl, nr - pr
        return round(
            ((pl * pl + ql * ql) * nr + (pr * pr + qr * qr) * nl)
            / (nl * nr),
            6,
        )

    cands = sorted(set(xr))[:-1]
    best = max(cands, key=lambda t: (purity(t), -t))
    assert leaves["R"]["threshold"] == best


def test_shuffle_hash_matches_plain_join(spark):
    from mapreduce_server_spark.sources.loader import Tables
    import pyspark.sql.functions as F

    t = Tables(spark, SF001)
    plain = (
        t.lineitem.join(
            t.orders.where(F.col("o_orderstatus") == "O"),
            t.lineitem.l_orderkey == t.orders.o_orderkey,
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    got = {
        r["o_orderpriority"]: r
        for r in REGISTRY["join_shuffle_hash"].fn(spark, SF001).collect()
    }
    for r in plain.collect():
        g = got[r["o_orderpriority"]]
        assert g["n_items"] == r["n_items"]
        assert g["revenue"] == r["revenue"]  # decimal-exact → bit-equal


def test_hist_quantile_matches_numpy(spark, duck):
    rows = {
        r["event_type"]: r
        for r in REGISTRY["sketch_hist_quantile"].fn(spark, SF001).collect()
    }
    ev = duck.execute("SELECT event_type, value FROM events").df()
    for t, g in ev.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        n = len(v)
        got = rows[t]
        assert got["n"] == n
        for p, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            k = -(-n * p // 100)  # ceil(n*p/100)
            assert got[col] == v[k - 1]  # type-1 lower quantile


def test_regression_stump_is_true_argmax(spark, duck):
    got = REGISTRY["ml_regression_stump"].fn(spark, SF001).collect()[0]
    li = duck.execute(
        "SELECT l_quantity, l_extendedprice FROM lineitem"
    ).df()
    x = li["l_quantity"].to_numpy()
    y = li["l_extendedprice"].to_numpy()

    def score(thr):
        # the engine's 6-dp-rounded argmax criterion (SSE drop-out form)
        l, r = y[x <= thr], y[x > thr]
        return round(
            l.sum() ** 2 / len(l) + r.sum() ** 2 / len(r), 6
        )

    cands = sorted(set(x))[:-1]
    best = max(cands, key=lambda t: (score(t), -t))
    assert got["threshold"] == best
    l = y[x <= best]
    r = y[x > best]
    assert got["n_left"] == len(l) and got["n_right"] == len(r)
    assert abs(got["mean_left"] - l.mean()) < 1e-4
    assert abs(got["mean_right"] - r.mean()) < 1e-4


def test_histq_twin_matches_batch(spark, tmp_path):
    """The drained streaming histogram state reproduces the batch
    quantile sketch bit-for-bit per event type (mergeability proof:
    micro-batch partials merged key-wise == one-shot histogram)."""
    import os
    import shutil

    from mapreduce_server_spark.streaming import twins

    events_dir = str(tmp_path / "events_src")
    os.makedirs(events_dir, exist_ok=True)
    shutil.copyfile(
        f"{SF001}/events.parquet", os.path.join(events_dir, "events.parquet")
    )
    ckpt = str(tmp_path / "histq_ckpt")
    stream = twins.events_stream(spark, events_dir, max_files_per_trigger=1)
    rows = twins.run_collect(twins.histq(stream), "update", ckpt)
    final = {}
    for r in rows:
        final[r.event_type] = (r.n, r.p50, r.p90, r.p99)
    batch = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in REGISTRY["sketch_hist_quantile"].fn(spark, SF001).collect()
    }
    assert final == batch


def test_als_halfstep_matches_numpy(spark, duck):
    rows = {
        r["custkey"]: r
        for r in REGISTRY["ml_als_halfstep"].fn(spark, SF001).collect()
    }
    inter = duck.execute(
        """
        SELECT o.o_custkey AS c, l.l_partkey % 7 - 3 AS f2, l.l_quantity AS r
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        """
    ).df()
    lam = 1.0
    for c, g in list(inter.groupby("c"))[:50]:
        F2 = np.column_stack([np.ones(len(g)), g["f2"].to_numpy(float)])
        r = g["r"].to_numpy(float)
        A = F2.T @ F2 + lam * np.eye(2)
        w = np.linalg.solve(A, F2.T @ r)
        got = rows[c]
        assert got["n_items"] == len(g)
        assert abs(got["w1"] - w[0]) < 1e-5
        assert abs(got["w2"] - w[1]) < 1e-5


def test_multimodal_dedup_matches_text_dups(spark, duck):
    rows = REGISTRY["multimodal_dedup"].fn(spark, SF001).collect()
    want = dict(
        duck.execute(
            "SELECT md5(text), count(*) FROM documents"
            " GROUP BY 1 HAVING count(*) >= 2"
        ).fetchall()
    )
    assert {r["digest"]: r["n_copies"] for r in rows} == want
    for r in rows:
        # survivor is the smallest id carrying that digest
        sid = duck.execute(
            "SELECT min(doc_id) FROM documents WHERE md5(text) = ?",
            [r["digest"]],
        ).fetchone()[0]
        assert r["survivor_id"] == sid


def test_multifeature_beats_or_ties_single_feature(spark):
    best = REGISTRY["ml_dtree_multifeature"].fn(spark, SF001).collect()[0]
    chars_only = REGISTRY["ml_dtree_stump"].fn(spark, SF001).collect()[0]
    assert best["feature"] in ("n_chars", "n_tokens")
    # the cross-feature argmax can never be worse than the n_chars one
    assert best["purity"] >= chars_only["purity"]
    if best["feature"] == "n_chars":
        assert best["threshold"] == chars_only["threshold"]


def test_cramers_v_bounds_and_formula(spark, duck):
    row = REGISTRY["stat_cramers_v"].fn(spark, SF001).collect()[0]
    assert 0.0 <= row["v"] <= 1.0
    import math

    want = round(
        math.sqrt(
            row["chi2"] / (row["n"] * min(row["nr"] - 1, row["nc"] - 1))
        ),
        6,
    )
    assert row["v"] == want
    # chi2 agrees with the standalone stat_chi2 query
    chi = REGISTRY["stat_chi2"].fn(spark, SF001).collect()[0]
    assert row["chi2"] == chi["chi2"]


def test_fourier_daily_matches_numpy(spark, duck):
    rows = {
        r["event_type"]: r
        for r in REGISTRY["ts_fourier_daily"].fn(spark, SF001).collect()
    }
    ev = duck.execute(
        "SELECT event_type, value,"
        " (epoch_us(ts::TIMESTAMP) // 1000000) % 86400 AS sod"
        " FROM events"
    ).df()
    for t, g in ev.groupby("event_type"):
        theta = 2 * np.pi * g["sod"].to_numpy(float) / 86400
        v = g["value"].to_numpy(float)
        a1 = float((v * np.cos(theta)).sum())
        b1 = float((v * np.sin(theta)).sum())
        got = rows[t]
        assert got["n"] == len(g)
        # engine quantizes the basis at 6 dp; tolerance covers that
        assert abs(got["a1"] - a1) < 0.05
        assert abs(got["b1"] - b1) < 0.05
        assert abs(got["amplitude"] - np.hypot(a1, b1)) < 0.1
        assert abs(got["phase"] - np.arctan2(b1, a1)) < 0.01


def test_gbdt_round2_residual_fit(spark, duck):
    row = REGISTRY["ml_gbdt_round2"].fn(spark, SF001).collect()[0]
    stump = REGISTRY["ml_regression_stump"].fn(spark, SF001).collect()[0]
    # round 1 threshold must equal the standalone regression stump's
    assert row["threshold1"] == stump["threshold"]
    li = duck.execute(
        "SELECT l_quantity, l_extendedprice FROM lineitem"
    ).df()
    x = li["l_quantity"].to_numpy()
    y = li["l_extendedprice"].to_numpy()
    t1 = row["threshold1"]
    ml = round(float(y[x <= t1].mean()), 6)
    mr = round(float(y[x > t1].mean()), 6)
    resid = y - np.where(x <= t1, ml, mr)

    def score(thr):
        l, r = resid[x <= thr], resid[x > thr]
        return round(
            l.sum() ** 2 / len(l) + r.sum() ** 2 / len(r), 6
        )

    cands = sorted(set(x))[:-1]
    best = max(cands, key=lambda t: (score(t), -t))
    assert row["threshold2"] == best
    assert row["n_left"] == int((x <= best).sum())


def test_dispersion_matches_numpy(spark, duck):
    rows = {
        r["event_type"]: r
        for r in REGISTRY["stat_dispersion"].fn(spark, SF001).collect()
    }
    uc = duck.execute(
        "SELECT event_type, user_id, count(*) AS c FROM events"
        " GROUP BY 1, 2"
    ).df()
    for t, g in uc.groupby("event_type"):
        c = g["c"].to_numpy(float)
        got = rows[t]
        assert got["n_users"] == len(c)
        assert abs(got["mean_events"] - c.mean()) < 1e-6
        assert abs(got["dispersion"] - c.var(ddof=1) / c.mean()) < 1e-5


def test_viterbi_matches_python_dp(spark, duck):
    rows = {
        r["user_id"]: r
        for r in REGISTRY["ts_viterbi_regime"].fn(spark, SF001).collect()
    }
    df = duck.execute(
        """
        WITH med AS (SELECT user_id, median(value) AS med
                     FROM events GROUP BY 1)
        SELECT e.user_id, e.value > m.med AS o
        FROM events e JOIN med m USING (user_id)
        ORDER BY e.user_id, e.ts, e.event_id
        """
    ).df()
    tau = 2
    for uid, g in list(df.groupby("user_id"))[:100]:
        bits = g["o"].tolist()
        c0 = 1 if bits[0] else 0
        c1 = 0 if bits[0] else 1
        for o in bits[1:]:
            c0, c1 = (
                min(c0, c1 + tau) + (1 if o else 0),
                min(c1, c0 + tau) + (0 if o else 1),
            )
        got = rows[uid]
        assert got["n"] == len(bits)
        assert got["min_cost"] == min(c0, c1)
        assert got["final_high"] == (c1 < c0)
        # sanity: cost can never exceed all-mismatch
        assert got["min_cost"] <= len(bits)


def test_running_distinct_python_replay(spark, duck):
    rows = REGISTRY["win_running_distinct"].fn(spark, SF001).collect()
    ev = duck.execute(
        "SELECT user_id, event_id, event_type FROM events"
        " WHERE user_id % 50 = 0 ORDER BY user_id, ts, event_id"
    ).fetchall()
    want = {}
    seen: dict = {}
    for uid, eid, et in ev:
        s = seen.setdefault(uid, set())
        s.add(et)
        want[eid] = len(s)
    assert {r["event_id"]: r["n_types_so_far"] for r in rows} == want


def test_null_safe_join_keeps_null_bucket(spark):
    rows = {
        r["bucket"]: r
        for r in REGISTRY["join_null_safe"].fn(spark, SF001).collect()
    }
    # the NULL bucket must be present (NULL keys match each other)
    assert None in rows
    assert rows[None]["n_orders"] > 0 and rows[None]["n_cust"] > 0
