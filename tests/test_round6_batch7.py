"""Round-6 batch-7 operators: CEP sequence pattern, power-iteration PCA,
incremental-ingest dedup, dataset-card generation — semantics beyond the
oracle parity gate (test_oracle_parity covers exact value equality)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mapreduce_server_spark import REGISTRY
from mapreduce_server_spark.sources.loader import load_table

from .conftest import SF001


def test_stream_pattern_replays_in_python(spark):
    """Replay the contiguous-pattern count per user in plain Python over
    the ordered event log; every reported count must match, and no user
    with zero matches on both patterns may appear."""
    ev = (
        load_table(spark, SF001, "events")
        .select("user_id", "event_type", F.unix_seconds("ts").alias("s"), "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.s, r.event_id, r.event_type))
    expect = {}
    for u, rows in by_user.items():
        rows.sort()
        types = [t for _, _, t in rows]
        ss = [s for s, _, _ in rows]
        funnel = sum(
            1
            for i in range(len(types) - 2)
            if types[i : i + 3] == ["view", "click", "purchase"]
            and ss[i + 2] - ss[i] <= 3600
        )
        burst = sum(
            1 for i in range(len(types) - 1) if types[i : i + 2] == ["error", "error"]
        )
        if funnel or burst:
            expect[u] = (funnel, burst)
    got = {
        r.user_id: (r.n_funnel, r.n_error_burst)
        for r in REGISTRY["stream_pattern"].fn(spark, SF001).collect()
    }
    assert got == expect


def test_pca_power_matches_numpy_replay_and_is_unit(spark):
    """Replay both 6-dp-pinned power iterations in numpy; the loadings
    must match to 6 dp and the result must be (near-)unit-norm."""
    rows = load_table(spark, SF001, "embeddings").select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)

    def step(s):
        w = np.round((X * s[:, None]).mean(axis=0), 6)
        return np.round(w / np.sqrt((w * w).sum()), 6)

    v1 = step(X[:, 0])
    v2 = step(X @ v1)
    got = {
        r.dim: r.loading for r in REGISTRY["ml_pca_power"].fn(spark, SF001).collect()
    }
    assert len(got) == X.shape[1]
    for j in range(X.shape[1]):
        assert abs(got[j] - v2[j]) < 2e-6, (j, got[j], v2[j])
    nrm = float(np.sqrt(sum(v * v for v in got.values())))
    assert abs(nrm - 1.0) < 1e-4


def test_pca_power_captures_dominant_variance(spark):
    """The returned direction must capture at least as much variance as
    the best single raw axis (power iteration can only improve on its
    e0 start), sanity-checking it is a principal direction, not noise."""
    rows = load_table(spark, SF001, "embeddings").select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    v = np.array(
        [
            r.loading
            for r in sorted(
                REGISTRY["ml_pca_power"].fn(spark, SF001).collect(),
                key=lambda r: r.dim,
            )
        ]
    )
    var_v = float(((X @ v) ** 2).mean())
    var_axis = float((X**2).mean(axis=0).max())
    assert var_v >= 0.9 * var_axis


def test_incremental_dedup_partitions_the_batch(spark):
    """Every incoming doc is classified exactly once (counts partition
    n_incoming) and totals match the raw 20% split."""
    out = REGISTRY["pipeline_incremental_dedup"].fn(spark, SF001).collect()
    d = load_table(spark, SF001, "documents")
    n_inc = d.filter(F.col("doc_id") % 10 >= 8).count()
    assert sum(r.n_incoming for r in out) == n_inc
    for r in out:
        assert r.n_dup_base + r.n_dup_batch + r.n_admitted == r.n_incoming
    # admitted docs are globally novel: base hashes + admitted hashes
    # must equal the distinct hash count of base ∪ incoming-admitted
    assert sum(r.n_admitted for r in out) > 0


def test_dataset_card_invariants(spark):
    """Card metrics are internally consistent per source and cover the
    whole corpus."""
    out = REGISTRY["pipeline_dataset_card"].fn(spark, SF001).collect()
    d = load_table(spark, SF001, "documents")
    assert sum(r.n_docs for r in out) == d.count()
    for r in out:
        assert r.n_dup_texts >= 0 and r.n_dup_texts < r.n_docs
        assert r.max_chars * r.n_docs >= r.total_chars
        assert abs(r.avg_chars - r.total_chars / r.n_docs) < 1e-9
        assert r.n_langs >= 1
        assert r.n_tokens > r.n_docs  # every doc has >1 token


def test_pattern_twin_matches_batch(spark, tmp_path):
    """One drain of the streaming CEP twin reproduces the batch
    stream_pattern counts exactly — including matches that would span
    micro-batch boundaries (state carries the 2-event lookback)."""
    import os
    import shutil

    from mapreduce_server_spark.streaming import twins

    events_dir = str(tmp_path / "events_src")
    os.makedirs(events_dir, exist_ok=True)
    shutil.copyfile(
        f"{SF001}/events.parquet", os.path.join(events_dir, "events.parquet")
    )
    ckpt = str(tmp_path / "pattern_ckpt")
    stream = twins.events_stream(spark, events_dir, max_files_per_trigger=1)
    rows = twins.run_collect(twins.pattern(stream), "update", ckpt)
    # update mode re-emits per trigger — keep the LAST row per user
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_funnel, r.n_error_burst)
    batch = {
        r.user_id: (r.n_funnel, r.n_error_burst)
        for r in REGISTRY["stream_pattern"].fn(spark, SF001).collect()
    }
    for uid, counts in batch.items():
        assert final.get(uid) == counts, (uid, counts, final.get(uid))
    # users outside the batch result must have matched nothing
    for uid, (f, b) in final.items():
        if uid not in batch:
            assert f == 0 and b == 0, (uid, f, b)


def test_lttb_shape_and_endpoints(spark):
    """Every user series reduces to ≤ B points, endpoints always
    survive, and every output point is a real input point."""
    from mapreduce_server_spark.operators.stats_ml import _LTTB_B

    out = REGISTRY["ts_lttb"].fn(spark, SF001).collect()
    ev = (
        load_table(spark, SF001, "events")
        .select("user_id", F.unix_seconds("ts").alias("s"), "value", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.s, r.event_id, r.value))
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r.user_id, set()).add((r.ts_s, r.value))
    assert set(got) == set(by_user)
    all_pts = {
        (u, s, v) for u, rows in by_user.items() for s, _, v in rows
    }
    for u, pts in got.items():
        series = sorted(by_user[u])
        n = len(series)
        assert len(pts) == min(n, _LTTB_B), (u, len(pts))
        if n > _LTTB_B:
            first, last = series[0], series[-1]
            assert (first[0], first[2]) in pts
            assert (last[0], last[2]) in pts
        for s, v in pts:
            assert (u, s, v) in all_pts


def test_cli_sql_subcommand(spark, capsys):
    """The ad-hoc SQL surface registers all fixture tables through the
    normalizing loader and executes a statement end-to-end."""
    from mapreduce_server_spark.__main__ import main

    rc = main(
        [
            "sql",
            "SELECT count(*) AS n FROM events JOIN orders ON user_id = o_custkey % 1000",
        ]
    )
    assert rc == 0
    assert "n" in capsys.readouterr().out


def test_prf_consistent_with_confusion(spark):
    """P/R/F1 must recompute exactly from the confusion matrix cells."""
    conf = REGISTRY["ml_eval_confusion"].fn(spark, SF001).collect()
    prf = {r.label: r for r in REGISTRY["ml_eval_prf"].fn(spark, SF001).collect()}
    labels = {r.true_label for r in conf} | {r.pred_label for r in conf}
    assert set(prf) == labels
    for lbl in labels:
        tp = sum(r.n for r in conf if r.true_label == lbl and r.pred_label == lbl)
        fp = sum(r.n for r in conf if r.pred_label == lbl and r.true_label != lbl)
        fn = sum(r.n for r in conf if r.true_label == lbl and r.pred_label != lbl)
        row = prf[lbl]
        assert (row.tp, row.fp, row.fn) == (tp, fp, fn), lbl
        if tp + fp:
            assert abs(row.precision_ - tp / (tp + fp)) < 1e-6
        if tp + fn:
            assert abs(row.recall_ - tp / (tp + fn)) < 1e-6
        if 2 * tp + fp + fn:
            assert abs(row.f1 - 2 * tp / (2 * tp + fp + fn)) < 1e-6


def test_logreg_step_matches_numpy_and_descends(spark):
    """Replay both 6-dp-pinned GD steps in numpy; the loss after w2 must
    not exceed the w=0 baseline loss (the step actually learns)."""
    rows = (
        load_table(spark, SF001, "embeddings")
        .select("embedding", "label")
        .collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    y = np.array([r.label % 2 for r in rows], dtype=np.float64)
    w1 = np.round(((y - 0.5)[:, None] * X).mean(axis=0), 6)
    p = 1.0 / (1.0 + np.exp(-(X @ w1)))
    w2 = np.round(w1 + np.round(((y - p)[:, None] * X).mean(axis=0), 6), 6)
    got = {
        r.dim: (r.w1, r.w2)
        for r in REGISTRY["ml_logreg_step"].fn(spark, SF001).collect()
    }
    assert len(got) == X.shape[1]
    for j in range(X.shape[1]):
        assert abs(got[j][0] - w1[j]) < 2e-6, j
        assert abs(got[j][1] - w2[j]) < 2e-6, j

    def loss(w):
        z = X @ w
        return float(np.mean(np.log1p(np.exp(-np.abs(z))) + np.maximum(-z * (2 * y - 1), 0)))

    assert loss(w2) <= loss(np.zeros_like(w2)) + 1e-9


def test_asof_nearest_is_min_of_directional(spark):
    """For every purchase that has both a backward and a forward match,
    nearest must pick whichever directional candidate is closer (earlier
    click on exact ties); purchases with only one direction match that
    one."""
    back = {
        r.event_id: r.last_click_us
        for r in REGISTRY["join_asof"].fn(spark, SF001).collect()
    }
    fwd = {
        r.event_id: r.next_click_us
        for r in REGISTRY["join_asof_forward"].fn(spark, SF001).collect()
    }
    near = {
        r.event_id: r.nearest_click_us
        for r in REGISTRY["join_asof_nearest"].fn(spark, SF001).collect()
    }
    p_ts = {
        r.event_id: r.us
        for r in load_table(spark, SF001, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    assert set(near) == set(back) | set(fwd)
    for eid, nv in near.items():
        b, f = back.get(eid), fwd.get(eid)
        cands = [c for c in (b, f) if c is not None]
        best = min(abs(c - p_ts[eid]) for c in cands)
        ties = sorted(c for c in cands if abs(c - p_ts[eid]) == best)
        assert nv == ties[0], (eid, nv, b, f)


def test_kmv_estimates_and_merge_contract(spark):
    """KMV estimates land within the theoretical relative-error envelope
    (~1/sqrt(k-2) ≈ 18% at k=32; allow 3x) of the true distinct-hash
    counts, and the __all__ sketch derives purely from per-type k-mins."""
    from mapreduce_server_spark.operators.aggregates import _KMV_K

    rows = {r.scope: r for r in REGISTRY["sketch_kmv"].fn(spark, SF001).collect()}
    ev = load_table(spark, SF001, "events")
    types = [r.event_type for r in ev.select("event_type").distinct().collect()]
    assert set(rows) == set(types) | {"__all__"}
    # truth for __all__ is the GLOBAL distinct-user count (the merged
    # row's n_keys is the union-of-kmins size, a sketch-side quantity)
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    truth["__all__"] = ev.select("user_id").distinct().count()
    for scope, r in rows.items():
        if r.n_keys < _KMV_K:
            assert r.est_distinct == r.n_keys
        else:
            rel = abs(r.est_distinct - truth[scope]) / truth[scope]
            assert rel < 3.0 / (_KMV_K - 2) ** 0.5, (
                scope,
                r.est_distinct,
                truth[scope],
            )
    # merge contract: the union row's kth hash is the kth smallest of the
    # union of the per-type sketches' k-mins (not of the raw data)
    assert rows["__all__"].kth_hash >= min(r.kth_hash for r in rows.values())


def test_holt_seasonal_reduces_to_holt_on_flat_season(spark):
    """On the deseasonalized series the fold is exactly ts_holt's; check
    the composition by replaying index + fold in Python for 5 users."""
    ev = (
        load_table(spark, SF001, "events")
        .select("user_id", "ts", "event_id", "value", F.hour("ts").alias("h"))
        .collect()
    )
    tot = sum(round(r.value * 100) for r in ev) / 100.0
    gm = tot / len(ev)
    by_h: dict[int, list] = {}
    for r in ev:
        by_h.setdefault(r.h, []).append(round(r.value * 100))
    s = {h: (sum(v) / 100.0) / len(v) - gm for h, v in by_h.items()}
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value, r.h))
    got = {
        r.user_id: r for r in REGISTRY["ts_holt_seasonal"].fn(spark, SF001).collect()
    }
    for uid in sorted(by_user)[:5]:
        rows = sorted(by_user[uid])
        xs = [v - s[h] for _, _, v, h in rows]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = x * 0.5 + (l + b) * 0.5
            b = (nl - l) * 0.5 + b * 0.5
            l = nl
        r = got[uid]
        assert r.n_events == len(rows)
        assert r.level_last == l and r.trend_last == b, uid
        assert r.forecast_next == l + b + s[(rows[-1][3] + 1) % 24], uid


def test_benford_shares_partition_and_reference_sums_to_one(spark):
    """Per type the observed shares sum to 1 (within 9 roundings) and
    the Benford reference shares are the textbook log10(1+1/d) table."""
    import math

    rows = REGISTRY["stat_benford"].fn(spark, SF001).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.digit <= 9
        assert abs(r.benford_share - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert abs(sum(r.share for r in rs) - 1.0) < 9e-6, t
        n_tot = sum(r.n for r in rs)
        for r in rs:
            assert abs(r.share - r.n / n_tot) < 1e-6


def test_lift_pairs_replay(spark):
    """Replay lift scoring in Python from raw baskets for the returned
    top-20: values must match and the list must be lift-descending."""
    li = (
        load_table(spark, SF001, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import Counter, defaultdict

    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    n_orders = len(baskets)
    item = Counter()
    pair = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        item.update(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair[(a, b)] += 1
    out = REGISTRY["rec_lift_pairs"].fn(spark, SF001).collect()
    assert len(out) == 20
    lifts = [r.lift for r in out]
    assert lifts == sorted(lifts, reverse=True)
    for r in out:
        n_ab = pair[(r.part_a, r.part_b)]
        assert n_ab == r.n_ab and n_ab >= 3
        expect = round(n_ab * n_orders / (item[r.part_a] * item[r.part_b]), 6)
        assert abs(r.lift - expect) < 1e-9


def test_pca_deflate_orthogonal_and_unit(spark):
    """PC2 must be (near-)unit and (near-)orthogonal to PC1, and must
    capture less or equal variance than PC1 on the raw corpus."""
    v1 = np.array(
        [
            r.loading
            for r in sorted(
                REGISTRY["ml_pca_power"].fn(spark, SF001).collect(),
                key=lambda r: r.dim,
            )
        ]
    )
    v2 = np.array(
        [
            r.loading
            for r in sorted(
                REGISTRY["ml_pca_deflate"].fn(spark, SF001).collect(),
                key=lambda r: r.dim,
            )
        ]
    )
    assert abs(np.linalg.norm(v2) - 1.0) < 1e-4
    assert abs(float(v1 @ v2)) < 1e-2  # 2 power iterations ≈ orthogonal
    rows = load_table(spark, SF001, "embeddings").select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    assert float(((X @ v2) ** 2).mean()) <= float(((X @ v1) ** 2).mean()) * 1.01


def test_matview_incremental_equals_full_rebuild(spark):
    """Merged base+delta partials must equal the one-shot rollup."""
    full = (
        load_table(spark, SF001, "events")
        .groupBy(
            F.unix_seconds(F.date_trunc("day", "ts")).alias("day_s"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sv"),
            F.countDistinct("user_id").alias("u"),
        )
        .collect()
    )
    want = {(r.day_s, r.event_type): (r.n, r.sv, r.u) for r in full}
    got = {
        (r.day_s, r.event_type): (r.n, r.sum_value, r.n_users_exact)
        for r in REGISTRY["matview_incremental"].fn(spark, SF001).collect()
    }
    assert got == want


def test_kmv_twin_matches_batch(spark, tmp_path):
    """The drained streaming KMV state reproduces the batch sketch
    bit-for-bit per event type: same kth minimum, same estimate."""
    import os
    import shutil

    from mapreduce_server_spark.streaming import twins

    events_dir = str(tmp_path / "events_src")
    os.makedirs(events_dir, exist_ok=True)
    shutil.copyfile(
        f"{SF001}/events.parquet", os.path.join(events_dir, "events.parquet")
    )
    ckpt = str(tmp_path / "kmv_ckpt")
    stream = twins.events_stream(spark, events_dir, max_files_per_trigger=1)
    rows = twins.run_collect(twins.kmv(stream), "update", ckpt)
    final = {}
    for r in rows:
        final[r.event_type] = (r.kth_hash, r.est_distinct)
    batch = {
        r.scope: (r.kth_hash, r.est_distinct)
        for r in REGISTRY["sketch_kmv"].fn(spark, SF001).collect()
        if r.scope != "__all__"
    }
    assert final == batch


def test_attribution_conserves_revenue(spark):
    """Attribution is a partition of purchases: counts and revenue sum
    to the raw purchase totals regardless of campaign assignment."""
    out = REGISTRY["join_attribution"].fn(spark, SF001).collect()
    ev = load_table(spark, SF001, "events").filter(
        F.col("event_type") == "purchase"
    )
    n = ev.count()
    total = sum(
        r.c
        for r in ev.select(
            (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c")
        ).collect()
    )
    assert sum(r.n_purchases for r in out) == n
    assert abs(sum(r.revenue for r in out) - total / 100.0) < 1e-6
    assert {r.campaign for r in out} <= set(range(-1, 10))


def test_kmv_jaccard_tracks_exact_overlap(spark):
    """The sketch-only Jaccard estimate must land near the exact
    user-set Jaccard for every type pair (k=32 → generous envelope),
    and all 10 unordered pairs of the 5 types must appear."""
    out = REGISTRY["sketch_kmv_jaccard"].fn(spark, SF001).collect()
    assert len(out) == 10
    ev = load_table(spark, SF001, "events").select("event_type", "user_id").collect()
    sets: dict[str, set] = {}
    for r in ev:
        sets.setdefault(r.event_type, set()).add(r.user_id)
    for r in out:
        a, b = sets[r.type_a], sets[r.type_b]
        exact = len(a & b) / len(a | b)
        assert abs(r.jaccard_est - exact) < 0.35, (r.type_a, r.type_b, exact)
        assert 0.0 <= r.jaccard_est <= 1.0


def test_schema_drift_profiles_are_consistent(spark):
    """Row counts per side must match the split; distinct counts of the
    incoming side can never exceed the side's row count."""
    out = {r.col_name: r for r in REGISTRY["quality_schema_drift"].fn(spark, SF001).collect()}
    d = load_table(spark, SF001, "documents")
    n_inc = d.filter(F.col("doc_id") % 10 >= 8).count()
    n_base = d.count() - n_inc
    for c, r in out.items():
        assert (r.base_rows, r.inc_rows) == (n_base, n_inc), c
        assert r.inc_distinct <= r.inc_rows and r.base_distinct <= r.base_rows
        assert 0.0 <= r.base_null_rate <= 1.0 and 0.0 <= r.inc_null_rate <= 1.0


def test_naive_bayes_confusion_covers_test_split(spark):
    """Confusion counts partition the held-out block split, labels come
    from the training source set, and a Python replay of the model
    agrees on predictions for a sample of docs."""
    import math
    from collections import Counter, defaultdict

    docs = load_table(spark, SF001, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    train = [(r.source, r.text.split(" ")) for r in docs if (r.doc_id // 20) % 2 == 0]
    test = [
        (r.doc_id, r.source, r.text.split(" "))
        for r in docs
        if (r.doc_id // 20) % 2 == 1
    ]
    out = REGISTRY["ml_naive_bayes"].fn(spark, SF001).collect()
    assert sum(r.n for r in out) == len(test)
    srcs = {s for s, _ in train}
    assert {r.true_source for r in out} <= srcs
    assert {r.pred_source for r in out} <= srcs
    # replay the model
    wc: dict = defaultdict(Counter)
    nc = Counter()
    for s, toks in train:
        wc[s].update(toks)
        nc[s] += 1
    vocab = {w for s in wc for w in wc[s]}
    V = len(vocab)
    tot = {s: sum(wc[s].values()) for s in wc}
    n = sum(nc.values())

    def predict(toks):
        best = None
        for s in sorted(wc):
            sc = math.log(nc[s] / n) + sum(
                cnt * math.log((wc[s][w] + 1) / (tot[s] + V))
                for w, cnt in sorted(Counter(t for t in toks if t in vocab).items())
            )
            if best is None or sc > best[0] + 1e-12:
                best = (sc, s)
        return best[1]

    replay = Counter()
    for _, true_s, toks in test:
        replay[(true_s, predict(toks))] += 1
    got = {(r.true_source, r.pred_source): r.n for r in out}
    assert got == dict(replay)


def test_m4_buckets_cover_and_bound(spark):
    """Every user gets ≤12 buckets covering all events; min/max bound
    first/last; t ranges are disjoint and ordered per user."""
    out = REGISTRY["ts_m4"].fn(spark, SF001).collect()
    ev = load_table(spark, SF001, "events")
    per_user = {
        r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()
    }
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
        assert r.min_v <= r.first_v <= r.max_v
        assert r.min_v <= r.last_v <= r.max_v
        assert r.t_first <= r.t_last
    for u, rows in by_user.items():
        rows.sort(key=lambda r: r.bkt)
        assert len(rows) <= 12
        assert sum(r.n for r in rows) == per_user[u]
        for a, b in zip(rows, rows[1:]):
            assert a.t_last <= b.t_first or a.t_last <= b.t_last


def test_drawdown_replay(spark):
    """Replay cumulative-sum drawdown in integer cents for 5 users."""
    ev = (
        load_table(spark, SF001, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    got = {r.user_id: r for r in REGISTRY["win_drawdown"].fn(spark, SF001).collect()}
    for u in sorted(by_user)[:5]:
        rows = sorted(by_user[u])
        cum = peak = 0
        worst = 0
        for _, _, v in rows:
            cum += round(v * 100)
            peak = max(peak, cum)
            worst = max(worst, peak - cum)
        r = got[u]
        assert r.n == len(rows)
        assert abs(r.max_drawdown - worst / 100.0) < 1e-9
        assert abs(r.peak_cum - peak / 100.0) < 1e-9


def test_runs_test_replay(spark):
    """Replay the run counting and z-score per event type in Python."""
    import statistics as st

    ev = (
        load_table(spark, SF001, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    by_t: dict[str, list] = {}
    for r in ev:
        by_t.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    got = {r.event_type: r for r in REGISTRY["stat_runs_test"].fn(spark, SF001).collect()}
    assert set(got) == set(by_t)
    for t, rows in by_t.items():
        med = st.median([v for _, _, v in rows])
        seq = [v > med for _, _, v in sorted(rows) if v != med]
        runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        n, n1 = len(seq), sum(seq)
        n2 = n - n1
        mu = 2.0 * n1 * n2 / n + 1
        var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
        r = got[t]
        assert (r.n_runs, r.n1, r.n2) == (runs, n1, n2), t
        assert abs(r.z_score - (runs - mu) / var**0.5) < 2e-6, t
