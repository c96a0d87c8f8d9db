"""Rows-only similarity operators: LSH consistency vs the exact
brute-force baseline, and the approx-distinct error bound."""

from __future__ import annotations

from mapreduce_server_spark import REGISTRY

from .conftest import SF001


def test_knn_lsh_scores_match_bruteforce(spark):
    """Every LSH candidate's cosine must equal the exact cosine the
    brute-force scan computes for the same vec_id (same fold, same
    rounding) — LSH changes the candidate set, never the scores."""
    sf = "/root/testdata/sf0.01"
    brute = {
        r.vec_id: r.cos_sim
        for r in REGISTRY["knn_bruteforce"].fn(spark, sf).collect()
    }
    lsh_rows = REGISTRY["knn_lsh"].fn(spark, sf).collect()
    assert len(lsh_rows) > 0, "query bucket must not be empty at fixture scale"
    exact_all = dict(brute)
    for r in lsh_rows:
        if r.vec_id in exact_all:
            assert exact_all[r.vec_id] == r.cos_sim


def test_knn_lsh_multiprobe_buckets_and_recall(spark):
    """Candidates come only from the query bucket or its Hamming-1
    sign-flips (the multi-probe set), and the probe set is enough to
    recover the exact top-1 neighbor on this corpus."""
    sf = "/root/testdata/sf0.01"
    from mapreduce_server_spark.operators.similarity import (
        N_PLANES,
        _hyperplane,
        _query_vector,
    )

    qv = _query_vector(spark, sf)
    q_bucket = 0
    for p in range(N_PLANES):
        acc = 0.0
        for x, c in zip(qv, _hyperplane(p)):
            acc += float(x) * c
        if acc >= 0:
            q_bucket += 1 << p
    probes = {q_bucket} | {q_bucket ^ (1 << p) for p in range(N_PLANES)}
    rows = REGISTRY["knn_lsh"].fn(spark, sf).collect()
    assert {r.bucket for r in rows} <= probes
    brute_top1 = REGISTRY["knn_bruteforce"].fn(spark, sf).collect()[0].vec_id
    assert brute_top1 in {r.vec_id for r in rows}


def test_approx_distinct_within_rsd(spark):
    sf = "/root/testdata/sf0.01"
    approx = {
        r.l_returnflag: r.approx_parts
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf).collect()
    }
    exact = {
        r.l_returnflag: r.n_parts
        for r in REGISTRY["agg_distinct"].fn(spark, sf).collect()
    }
    for flag, n in exact.items():
        assert abs(approx[flag] - n) / n < 0.1  # rsd 0.02, generous margin


def test_approx_percentile_close_to_exact(spark):
    sf = "/root/testdata/sf0.01"
    from mapreduce_server_spark import REGISTRY

    exact = {
        r.event_type: r.med for r in REGISTRY["agg_percentile"].fn(spark, sf).collect()
    }
    approx = {
        r.event_type: r.approx_med
        for r in REGISTRY["agg_approx_percentile"].fn(spark, sf).collect()
    }
    for et, med in exact.items():
        # accuracy 1000 → rank error ≤ ~0.1%; generous value-space margin
        assert abs(approx[et] - med) / max(abs(med), 1e-9) < 0.05


def test_knn_ivf_recall_and_exact_scores(spark):
    """IVF candidates score identically to brute force (same cosine fold,
    same rounding — IVF changes the candidate set, never the scores), the
    exact top-1 survives probing, and recall@10 stays ≥ 0.8 (measured:
    1.0 at sf0.01, 0.9 at sf0.001/sf0.1 on the noise-embedding fixture)."""
    sf = "/root/testdata/sf0.01"
    from mapreduce_server_spark.operators.similarity import IVF_NPROBE

    brute = REGISTRY["knn_bruteforce"].fn(spark, sf).collect()
    ivf = REGISTRY["knn_ivf"].fn(spark, sf).collect()
    assert len(ivf) == 10
    assert len({r.cluster for r in ivf}) <= IVF_NPROBE
    bmap = {r.vec_id: r.cos_sim for r in brute}
    for r in ivf:
        if r.vec_id in bmap:
            assert r.cos_sim == bmap[r.vec_id]
    top10 = {r.vec_id for r in brute}
    assert len(top10 & {r.vec_id for r in ivf}) >= 8
    assert brute[0].vec_id in {r.vec_id for r in ivf}


def test_knn_ivf_deterministic_rebuild(spark):
    """Rebuilding the quantizer from scratch (cache cleared) reproduces
    identical output rows — the 6-dp Lloyd rounding pins learned state."""
    sf = "/root/testdata/sf0.01"
    from mapreduce_server_spark.operators.similarity import _IVF_CACHE, knn_ivf

    first = [tuple(r) for r in knn_ivf(spark, sf).collect()]
    _IVF_CACHE.pop(sf, None)
    second = [tuple(r) for r in knn_ivf(spark, sf).collect()]
    assert first == second


def test_emb_quantize_error_bounded_by_half_step(spark):
    """Absmax int8 quantization error is at most half a quantization step
    (0.5/scale) per element; saturation only at the absmax element."""
    rows = REGISTRY["emb_quantize"].fn(spark, SF001).collect()
    assert len(rows) == 500
    for r in rows:
        step_half = 0.5 / r.scale
        # both sides of the bound are 6-dp-rounded report columns → ±5e-7
        assert r.max_abs_err <= step_half + 1e-6
        assert r.mean_abs_err <= r.max_abs_err
        assert r.n_saturated >= 1  # the absmax element maps to ±127


def test_knn_ivf_pruned_matches_and_prunes_partitions(spark):
    """The persisted-IVF probe returns exactly knn_ivf's rows, its scan
    carries a partition filter on the cell id, and the pruned file set
    touches only the NPROBE probed cell directories."""
    import re

    from mapreduce_server_spark.operators.similarity import IVF_K, IVF_NPROBE

    sf = "/root/testdata/sf0.01"
    pruned = REGISTRY["knn_ivf_pruned"].fn(spark, sf)
    base = REGISTRY["knn_ivf"].fn(spark, sf)
    want = [(r.vec_id, r.cluster, r.cos_sim) for r in base.collect()]
    got = [(r.vec_id, r.cluster, r.cos_sim) for r in pruned.collect()]
    assert got == want

    # the scan node itself must carry the cell-id partition filter, with
    # exactly the NPROBE probed cells enumerated — pruning happens at the
    # file index, before any IO
    from mapreduce_server_spark.plans import plan_string

    plan = plan_string(pruned, "formatted")
    m = re.search(r"PartitionFilters: \[cluster#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, plan[:2000]
    cells = {int(x) for x in m.group(1).split(",")}
    assert len(cells) == IVF_NPROBE < IVF_K, cells


def test_knn_ivf_probe_recall_tradeoff(spark, monkeypatch):
    """The IVF knob, measured: recall@10 is non-decreasing in nprobe and
    reaches 1.0 when probing every cell (candidate set = whole index ⇒
    IVF degrades gracefully to brute force). This is the table an
    operator owner tunes at scale — cells scanned ∝ nprobe/K of the
    index."""
    from mapreduce_server_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.01"
    top10 = {r.vec_id for r in REGISTRY["knn_bruteforce"].fn(spark, sf).collect()}
    recalls = []
    for nprobe in (1, 2, 4, sim.IVF_K):
        monkeypatch.setattr(sim, "IVF_NPROBE", nprobe)
        got = {r.vec_id for r in REGISTRY["knn_ivf"].raw_fn(spark, sf).collect()}
        recalls.append(len(top10 & got) / 10)
    assert recalls == sorted(recalls)  # more probes never hurt
    assert recalls[-1] == 1.0  # full probe ≡ brute force
    assert recalls[0] >= 0.3  # one cell already carries a useful share


def test_lsh_join_recall_floor(spark):
    """The multi-table LSH join's measured trade: recall@3 vs the exact
    knn_join must clear 0.6 (8 tables x 4 planes on the fixture
    embeddings; single-table 6-plane recall was 0.06 — the tables are
    what buy recall), and every emitted pair must be exactly scored
    (score == exact dot, already oracle-pinned)."""
    exact = {}
    for r in REGISTRY["knn_join"].fn(spark, SF001).collect():
        exact.setdefault(r.vec_id, set()).add(r.nbr_id)
    approx = {}
    for r in REGISTRY["knn_join_lsh"].fn(spark, SF001).collect():
        approx.setdefault(r.vec_id, set()).add(r.nbr_id)
    hits = sum(len(exact[v] & approx.get(v, set())) for v in exact)
    total = sum(len(s) for s in exact.values())
    assert total > 0
    assert hits / total >= 0.6, hits / total


def test_ivf_quantizer_trains_on_capped_sample(spark, tmp_path):
    """Past IVF_TRAIN_CAP the quantizer must train on the deterministic
    md5-bucket sample, not the corpus: the collect is bounded (~cap
    rows) regardless of corpus size, and retraining after a cache clear
    reproduces identical centroids (seedless hash sample + pinned Lloyd
    rounds). Synthesizes a 3×cap corpus so the sampling branch engages
    — the real fixtures sit under the cap and keep full-corpus
    training."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_server_spark.operators.similarity import (
        _IVF_CACHE,
        IVF_K,
        IVF_TRAIN_CAP,
        _ivf_centroids,
    )

    n, dim = 3 * IVF_TRAIN_CAP, 4
    # deterministic synthetic vectors (no RNG): low-discrepancy-ish grid
    vals = [[float((i * (j + 3)) % 97) / 97.0 for j in range(dim)] for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vals, pa.list_(pa.float32())),
                "label": pa.array([i % 5 for i in range(n)], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    d = str(tmp_path)
    try:
        first = _ivf_centroids(spark, d)
        assert len(first) == IVF_K and all(len(c) == dim for c in first)
        _IVF_CACHE.pop(d, None)
        second = _ivf_centroids(spark, d)
        assert first == second
        # the sample actually engaged: replicate the bucket filter and
        # check it is bounded near the cap (binomial slack, never 3×cap)
        import duckdb

        keep = max(1, (65536 * IVF_TRAIN_CAP) // n)
        kept = duckdb.sql(
            f"""
            SELECT count(*) FROM '{tmp_path / "embeddings.parquet"}'
            WHERE ('0x' || substring(md5(vec_id::VARCHAR), 1, 4))::BIGINT < {keep}
            """
        ).fetchone()[0]
        assert 0 < kept <= int(IVF_TRAIN_CAP * 1.2)
        assert kept < n // 2
    finally:
        _IVF_CACHE.pop(d, None)


def test_cell_stats_partition_of_corpus(spark):
    """knn_cell_stats is a partition audit: populations sum to the
    corpus size, shares to ~1, and every cell is non-degenerate."""
    from mapreduce_server_spark.operators.similarity import IVF_K

    rows = REGISTRY["knn_cell_stats"].fn(spark, SF001).collect()
    assert len(rows) <= IVF_K
    n_corpus = REGISTRY["knn_cell_stats"].fn(spark, SF001).sparkSession.read.parquet(
        f"{SF001}/embeddings.parquet"
    ).count()
    assert sum(r.n_vectors for r in rows) == n_corpus
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4  # 6-dp rounding slack
    for r in rows:
        assert r.n_vectors > 0 and r.avg_sqdist >= 0


def test_semdedup_survivor_invariants(spark):
    """SemDeDup accounting invariants: per-cell totals partition the
    corpus; at least one survivor per cell (the member minimal in the
    (centroid-cosine, vec_id) order can never be dropped — the drop
    rule requires a strictly-smaller neighbor); drop_ratio consistent."""
    rows = REGISTRY["knn_semdedup"].fn(spark, SF001).collect()
    n_corpus = spark.read.parquet(f"{SF001}/embeddings.parquet").count()
    assert sum(r.n_vectors for r in rows) == n_corpus
    for r in rows:
        assert 0 <= r.n_dropped < r.n_vectors  # >=1 survivor per cell
        assert abs(r.drop_ratio - round(r.n_dropped / r.n_vectors, 6)) < 1e-9
    # the rule actually fires on the fixture (non-degenerate demo)
    assert sum(r.n_dropped for r in rows) > 0


def test_knn_recall_histogram_replays_upstream(spark):
    """Independent replay of the knn_recall audit: rebuild the hits
    histogram in pure Python from the two UPSTREAM operators' collected
    outputs (not from knn_recall's own join) and compare exactly —
    histogram, shares (HALF_UP like the engines), and the corpus-size
    partition invariant. Also ties the audit to the long-standing
    recall floor: micro-recall derived from the histogram must clear
    the same 0.6 bar test_lsh_join_recall_floor pins."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    exact = {}
    for r in REGISTRY["knn_join"].fn(spark, SF001).collect():
        exact.setdefault(r.vec_id, set()).add(r.nbr_id)
    approx = {}
    for r in REGISTRY["knn_join_lsh"].fn(spark, SF001).collect():
        approx.setdefault(r.vec_id, set()).add(r.nbr_id)
    hist = Counter(
        len(nbrs & approx.get(v, set())) for v, nbrs in exact.items()
    )
    total = sum(hist.values())

    rows = {r.hits: r for r in REGISTRY["knn_recall"].fn(spark, SF001).collect()}
    assert {h: r.n_vectors for h, r in rows.items()} == dict(hist)
    assert sum(r.n_vectors for r in rows.values()) == total  # every vector
    for h, r in rows.items():
        want = Decimal(repr(hist[h] / total)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
        assert Decimal(repr(r.share)) == want
    micro = sum(h * c for h, c in hist.items()) / (3 * total)
    assert micro >= 0.6, micro
