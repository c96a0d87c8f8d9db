"""Semantics tests for the round-6 stats/ML tier (stats_ml.py +
pack_ffd): parity vs DuckDB is covered by test_oracle_parity's
registry sweep; these pin the *math* — OLS against numpy's closed form,
entropy bounds, seasonal-index mass balance, k-means invariants, and an
exact pure-Python FFD replay for the packer (the engine-independent
third opinion beside its round-8 recursive-CTE oracle)."""

from __future__ import annotations

import math

import numpy as np

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001

CAP = 128  # pack_ffd bin capacity (pipeline._FFD_CAP)


def test_linreg_matches_numpy(spark, duck):
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_linreg"].fn(spark, SF001).collect()
    }
    li = duck.execute(
        "SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem"
    ).fetchnumpy()
    for flag in set(li["l_returnflag"]):
        m = li["l_returnflag"] == flag
        x, y = li["l_quantity"][m], li["l_extendedprice"][m]
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        got = rows[flag]
        assert got["n"] == int(m.sum())
        assert abs(got["slope"] - slope) < 1e-4
        assert abs(got["intercept"] - intercept) < 1e-2
        assert abs(got["r2"] - r * r) < 1e-6


def test_entropy_bounds(spark):
    for r in REGISTRY["stat_entropy"].fn(spark, SF001).collect():
        assert 0.0 <= r["entropy"] <= math.log(r["n_langs"]) + 1e-9
        assert 0.0 <= r["entropy_norm"] <= 1.0 + 1e-9
        if r["n_langs"] > 1:
            assert abs(
                r["entropy_norm"] - r["entropy"] / math.log(r["n_langs"])
            ) < 1e-5


def test_seasonality_mass_balance(spark, duck):
    rows = REGISTRY["ts_seasonality"].fn(spark, SF001).collect()
    n_events = duck.execute("SELECT count(*) FROM events").fetchone()[0]
    assert sum(r["n"] for r in rows) == n_events
    # the n-weighted mean of the seasonal index is 1 per type by construction
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        nt = sum(r["n"] for r in rs)
        w = sum(r["n"] * r["seasonal_idx"] for r in rs) / nt
        assert abs(w - 1.0) < 1e-4, t


def test_kmeans_invariants(spark, duck):
    rows = REGISTRY["ml_kmeans"].fn(spark, SF001).collect()
    by_cid: dict[int, list] = {}
    for r in rows:
        by_cid.setdefault(r["cid"], []).append(r)
    assert set(by_cid) <= set(range(8))
    n_vecs = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    for cid, rs in by_cid.items():
        assert sorted(r["dim"] for r in rs) == list(range(64))
        assert len({r["n"] for r in rs}) == 1  # size constant per cluster
    assert sum(rs[0]["n"] for rs in by_cid.values()) == n_vecs


def test_kmeans_improves_over_seed_assignment(spark, duck):
    """Iteration-1 centroids give lower total inertia than the raw seed
    vectors — the Lloyd descent property, checked end-to-end in numpy."""
    emb = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    X = np.array([e for _, e in emb], dtype=np.float64)
    seeds = X[:8]

    def inertia(cents):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    asn0 = ((X[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    c1 = np.stack([X[asn0 == c].mean(axis=0) for c in np.unique(asn0)])
    assert inertia(c1) <= inertia(seeds) + 1e-9

    # and the engine's final centroids agree with a full numpy replay
    c1r = np.round(c1, 6)
    asn1 = ((X[:, None, :] - c1r[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    # c1r row c corresponds to seed-cid np.unique(asn0)[c]
    expect = {
        int(np.unique(asn0)[c]): np.round(X[asn1 == c].mean(axis=0), 6)
        for c in np.unique(asn1)
    }
    got: dict[int, dict[int, float]] = {}
    for r in REGISTRY["ml_kmeans"].fn(spark, SF001).collect():
        got.setdefault(r["cid"], {})[r["dim"]] = r["centroid"]
    assert set(got) == set(expect)
    for cid, cent in expect.items():
        vec = np.array([got[cid][d] for d in range(64)])
        assert np.abs(vec - cent).max() < 1e-6, cid


def test_pack_ffd_replays_reference(spark, duck):
    rows = REGISTRY["pack_ffd"].fn(spark, SF001).collect()
    docs = duck.execute(
        "SELECT source, doc_id, len(string_split(text, ' ')) FROM documents"
    ).fetchall()
    by_src: dict[str, list] = {}
    for s, d, n in docs:
        by_src.setdefault(s, []).append((d, n))
    expect = {}
    for s, items in by_src.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        rem: list[int] = []
        stats: list[list[int]] = []
        for _, nt in items:
            placed = next((i for i, r in enumerate(rem) if nt <= r), -1)
            if placed < 0:
                rem.append(CAP)
                stats.append([0, 0, 0])
                placed = len(rem) - 1
            rem[placed] -= nt
            stats[placed][0] += 1
            stats[placed][1] += nt
            stats[placed][2] = max(stats[placed][2], nt)
        for b, st in enumerate(stats):
            expect[(s, b)] = tuple(st)
    got = {
        (r["source"], r["bin_id"]): (
            r["n_docs"],
            r["total_tokens"],
            r["max_doc_tokens"],
        )
        for r in rows
    }
    assert got == expect
    for (s, b), (n_docs, total, mx) in got.items():
        assert total <= CAP or n_docs == 1  # oversize docs pack alone
        assert mx <= total


def test_moving_median_matches_pandas(spark, duck):
    rows = REGISTRY["win_moving_median"].fn(spark, SF001).collect()
    got = {r["event_id"]: r["med7"] for r in rows}
    df = duck.execute(
        # mirror the operator's demo-row cap (VERDICT r6 §next #2)
        "SELECT user_id, event_id, value FROM events WHERE user_id % 20 = 0 "
        "ORDER BY user_id, ts, event_id"
    ).fetch_df()
    expect = (
        df.groupby("user_id")["value"]
        .rolling(7, min_periods=1)
        .median()
        .reset_index(drop=True)
    )
    for eid, med in zip(df["event_id"], expect):
        assert abs(got[eid] - round(med, 6)) < 1e-9, eid


def test_cusum_matches_numpy(spark, duck):
    rows = {r["user_id"]: r for r in REGISTRY["ts_cusum"].fn(spark, SF001).collect()}
    df = duck.execute(
        "SELECT user_id, value FROM events ORDER BY user_id, ts, event_id"
    ).fetch_df()
    for uid, grp in df.groupby("user_id"):
        v = grp["value"].to_numpy()
        mean, std = v.mean(), v.std()  # population std, like the engine
        c, mx, alarms = 0.0, float("-inf"), 0
        for x in v:
            c = max(0.0, c + (x - mean - 0.5 * std))
            mx = max(mx, c)
            alarms += c > 4.0 * std
        r = rows[uid]
        assert r["n"] == len(v)
        assert abs(r["max_cusum"] - mx) < 1e-4
        assert r["n_alarms"] == alarms


def test_chi2_matches_numpy(spark, duck):
    (row,) = REGISTRY["stat_chi2"].fn(spark, SF001).collect()
    df = duck.execute(
        "SELECT source, lang, count(*) c FROM documents GROUP BY 1, 2"
    ).fetch_df()
    tab = df.pivot_table(
        index="source", columns="lang", values="c", fill_value=0
    ).to_numpy(dtype=float)
    n = tab.sum()
    e = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    mask = tab > 0  # engine sums observed cells only
    chi2 = (((tab - e) ** 2 / e)[mask]).sum()
    assert row["n_cells"] == int(mask.sum())
    assert abs(row["chi2"] - chi2) < 1e-4


def test_gini_matches_numpy(spark, duck):
    rows = {r["event_type"]: r for r in REGISTRY["stat_gini"].fn(spark, SF001).collect()}
    df = duck.execute("SELECT event_type, value FROM events").fetch_df()
    for et, grp in df.groupby("event_type"):
        x = np.sort(grp["value"].to_numpy())
        n = len(x)
        gini = 2.0 * (np.arange(1, n + 1) * x).sum() / (n * x.sum()) - (n + 1.0) / n
        r = rows[et]
        assert r["n"] == n
        assert abs(r["gini"] - gini) < 1e-6
        assert 0.0 <= r["gini"] <= 1.0


def test_mannwhitney_matches_numpy(spark, duck):
    rows = {
        r["source"]: r
        for r in REGISTRY["stat_mannwhitney"].fn(spark, SF001).collect()
    }
    df = duck.execute("SELECT source, n_chars FROM documents").fetch_df()
    vals = df["n_chars"].to_numpy()
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), dtype=float)
    i = 0
    sv = vals[order]
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # midrank of positions i+1..j
        i = j
    nt = len(vals)
    for src, grp in df.groupby("source"):
        m = (df["source"] == src).to_numpy()
        ns = int(m.sum())
        u = ranks[m].sum() - ns * (ns + 1) / 2.0
        r = rows[src]
        assert r["n_s"] == ns
        assert abs(r["u_stat"] - u) < 1e-9, src
        assert abs(r["auc"] - round(u / (ns * (nt - ns)), 6)) < 1e-9, src
        assert 0.0 <= r["auc"] <= 1.0


def test_decay_sum_matches_numpy(spark, duck):
    rows = {r["user_id"]: r for r in REGISTRY["ts_decay_sum"].fn(spark, SF001).collect()}
    df = duck.execute(
        "SELECT user_id, epoch(ts)::BIGINT AS es, value"
        " FROM events ORDER BY user_id, ts, event_id"
    ).fetch_df()
    for uid, grp in df.groupby("user_id"):
        es = grp["es"].to_numpy()
        v = grp["value"].to_numpy()
        s, prev = 0.0, None
        for t, x in zip(es, v):
            dh = 0 if prev is None else (t - prev) // 3600
            s = x + s * (1.0 / (1 << min(dh, 62)))
            prev = t
        r = rows[uid]
        assert r["n"] == len(v)
        assert r["decayed_sum"] == s, uid  # bit-exact by construction


def test_welch_t_matches_numpy(spark, duck):
    rows = {r["source"]: r for r in REGISTRY["stat_welch_t"].fn(spark, SF001).collect()}
    df = duck.execute("SELECT source, n_chars FROM documents").fetch_df()
    all_v = df["n_chars"].to_numpy(dtype=float)
    for src, grp in df.groupby("source"):
        a = grp["n_chars"].to_numpy(dtype=float)
        mask = (df["source"] != src).to_numpy()
        b = all_v[mask]
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        se2 = v1 / len(a) + v2 / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        dof = se2**2 / (
            (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
        )
        r = rows[src]
        assert r["n_s"] == len(a)
        assert abs(r["t_stat"] - t) < 1e-6, src
        assert abs(r["df"] - dof) < 1e-4, src


def test_asof_union_equals_join_form(spark):
    """Two physical strategies, one logical op: the union+running-last
    as-of must equal the candidate-join+row_number as-of row for row."""
    a = sorted(map(tuple, REGISTRY["join_asof"].fn(spark, SF001).collect()))
    b = sorted(map(tuple, REGISTRY["join_asof_union"].fn(spark, SF001).collect()))
    assert a == b and len(a) > 0


def test_knn_label_matches_numpy(spark, duck):
    rows = {r["vec_id"]: r for r in REGISTRY["ml_knn_label"].fn(spark, SF001).collect()}
    data = duck.execute(
        "SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in data])
    labels = np.array([r[1] for r in data])
    X = np.array([r[2] for r in data], dtype=np.float64)
    test_m, train_m = ids % 2 == 1, ids % 2 == 0
    Xt, Xr = X[test_m], X[train_m]
    rid, rlab = ids[train_m], labels[train_m]
    d = ((Xt[:, None, :] - Xr[None, :, :]) ** 2).sum(axis=2)
    for i, vid in enumerate(ids[test_m]):
        order = np.lexsort((rid, d[i]))[:5]
        votes: dict[int, int] = {}
        for lab in rlab[order]:
            votes[int(lab)] = votes.get(int(lab), 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        r = rows[int(vid)]
        assert r["pred_label"] == pred, vid
        assert r["votes"] == votes[pred], vid


def test_peak_detect_matches_pandas(spark, duck):
    rows = {r["event_id"]: r for r in REGISTRY["ts_peak_detect"].fn(spark, SF001).collect()}
    df = duck.execute(
        "SELECT user_id, event_id, value FROM events ORDER BY user_id, ts, event_id"
    ).fetch_df()
    expect = {}
    for _, grp in df.groupby("user_id"):
        v = grp["value"].to_numpy()
        eid = grp["event_id"].to_numpy()
        for i in range(1, len(v) - 1):
            if v[i] > v[i - 1] and v[i] > v[i + 1]:
                expect[int(eid[i])] = v[i] - max(v[i - 1], v[i + 1])
    assert set(rows) == set(expect)
    for e, prom in expect.items():
        assert rows[e]["prominence"] == prom, e


def test_hash_features_conservation(spark, duck):
    """Feature hashing loses no mass: per-doc bucket counts sum to the
    doc's token count, buckets stay in range."""
    rows = REGISTRY["text_hash_features"].fn(spark, SF001).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["bucket"] < 64
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["cnt"]
    expect = dict(
        duck.execute(
            "SELECT doc_id, len(string_split(text, ' ')) FROM documents"
        ).fetchall()
    )
    assert per_doc == expect


def test_centroid_classify_matches_numpy(spark, duck):
    rows = {
        r["vec_id"]: r
        for r in REGISTRY["ml_centroid_classify"].fn(spark, SF001).collect()
    }
    data = duck.execute(
        "SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in data])
    labels = np.array([r[1] for r in data])
    X = np.array([r[2] for r in data], dtype=np.float64)
    train_m, test_m = ids % 2 == 0, ids % 2 == 1
    labs = np.unique(labels[train_m])
    cents = np.stack(
        [np.round(X[train_m][labels[train_m] == l].mean(axis=0), 6) for l in labs]
    )
    d = ((X[test_m][:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    for i, vid in enumerate(ids[test_m]):
        order = np.lexsort((labs, d[i]))
        pred = int(labs[order[0]])
        r = rows[int(vid)]
        assert r["pred_label"] == pred, vid
        assert abs(r["sq_dist"] - d[i][order[0]]) < 1e-9, vid


def test_concentration_matches_pandas(spark, duck):
    rows = {
        r["event_type"]: r
        for r in REGISTRY["stat_concentration"].fn(spark, SF001).collect()
    }
    df = duck.execute(
        "SELECT event_type, user_id, sum(value) AS s FROM events GROUP BY 1, 2"
    ).fetch_df()
    for et, grp in df.groupby("event_type"):
        g = grp.sort_values(["s", "user_id"], ascending=[False, True])
        cr10 = g["s"].head(10).sum() / g["s"].sum()
        r = rows[et]
        assert r["n_users"] == len(g)
        assert abs(r["cr10"] - cr10) < 1e-6, et
        assert 0.0 < r["cr10"] <= 1.0


def test_confusion_consistent_with_predictions(spark, duck):
    """Matrix cells sum to the held-out count and agree per-vector with
    ml_knn_label joined to true labels."""
    cells = REGISTRY["ml_eval_confusion"].fn(spark, SF001).collect()
    n_test = duck.execute(
        "SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1"
    ).fetchone()[0]
    assert sum(c["n"] for c in cells) == n_test
    truth = dict(
        duck.execute("SELECT vec_id, label FROM embeddings").fetchall()
    )
    expect: dict[tuple[int, int], int] = {}
    for r in REGISTRY["ml_knn_label"].fn(spark, SF001).collect():
        key = (truth[r["vec_id"]], r["pred_label"])
        expect[key] = expect.get(key, 0) + 1
    got = {(c["true_label"], c["pred_label"]): c["n"] for c in cells}
    assert got == expect
