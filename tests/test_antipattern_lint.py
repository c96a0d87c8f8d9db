"""Registry-wide anti-pattern lint (round-8 verdict item 5): turns the
judge's manual scale audit into CI.

Three frozen invariants:
1. Driver-side materialization stays on the audited allowlist — every
   ``.collect()`` in the package is a bounded site (1-row scalar aggs,
   the capped 10k IVF training sample, serving-layer key lists); a NEW
   site fails here until it is audited and pinned.
2. No registered query's physical plan contains a CartesianProduct.
3. BroadcastNestedLoopJoin appears only on audited keys where the
   broadcast side is a bounded (≤ few rows / ≤ few KB) frame — every
   ``crossJoin`` in the package broadcasts a scalar-agg or constant
   frame; a new BNLJ on an unaudited key fails (it is how a
   non-equi join on two LARGE tables would sneak in).
"""

from __future__ import annotations

import os

from mapreduce_server_spark import REGISTRY

from .conftest import SF0001

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "mapreduce_server_spark")

#: audited bounded `.collect()` sites, path → occurrence count.
COLLECT_ALLOWLIST = {
    "serving/scheduler.py": 1,  # serving layer: materializes registered views
    "serving/matview.py": 2,  # matview refresh: distinct key lists (bounded)
    "streaming/twins.py": 1,  # foreachBatch sink for the streaming twin tests
    "operators/similarity.py": 1,  # IVF quantizer: capped 10k training sample
    "operators/quality.py": 1,  # 1-row scalar agg (corpus total)
    # k-center selection: seed fetch + K-1 argmax rounds, each a 1-row
    # TakeOrderedAndProject collect (Gonzalez traversal; cached per sf_dir)
    "operators/curation.py": 2,
}


def test_collect_sites_are_pinned():
    found: dict[str, int] = {}
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            n = open(path, encoding="utf-8").read().count(".collect()")
            if n:
                found[os.path.relpath(path, PKG)] = n
    assert found == COLLECT_ALLOWLIST, (
        "new/changed driver-side .collect() site(s) — audit that each is "
        f"bounded, then re-pin: {found}"
    )


#: keys whose plans legitimately contain BroadcastNestedLoopJoin —
#: audited: every broadcast side is a 1-row aggregate / ≤ few-row
#: constant frame (re-audit before adding a key here).
_BNLJ_ALLOWED: set[str] = {
    # round-8 audit sweep (46 keys, sf0.001, 0 CartesianProduct): each
    # BNLJ here is crossJoin(broadcast(x)) where x is a 1-row scalar
    # aggregate (totals/bounds/norms), a ≤ k-row trained-model frame
    # (centroids, stumps, PCA components), or the deliberate join_cross
    # demo — never a second large table.
    "dq_freshness", "graph_pagerank", "heavy_hitters", "join_bloom_semi",
    "join_cross", "knn_mmr", "knn_pq", "matview_incremental",
    "ml_centroid_classify", "ml_dtree_stump", "ml_eval_confusion",
    "ml_eval_prf", "ml_gbdt_round2", "ml_kmeans", "ml_knn_label",
    "ml_logreg_step", "ml_naive_bayes", "ml_pca_deflate", "ml_pca_power",
    "ml_regression_stump", "ml_silhouette", "ml_tree_depth2",
    "q11_important_parts", "q22_dormant_customers", "quality_drift_ks",
    "quality_drift_psi", "rank_hits", "rec_lift_pairs", "sketch_bloom",
    "sketch_kmv_jaccard", "stat_chi2", "stat_cramers_v",
    "stat_mannwhitney", "stat_permtest", "stat_welch_t", "text_bigram_lm",
    "text_bm25", "text_langid", "text_perplexity", "ts_acf_multi",
    "ts_changepoint_binseg", "ts_cross_corr", "ts_dtw", "ts_granger",
    "ts_holt_seasonal", "ts_ljungbox",
    # round-8 session 2: crossJoin(broadcast(folded)) where folded is
    # the 1-row lang-ordered weight-normalizer scalar (audited 2026-08-15)
    "sample_temperature",
    # round-9: rank_rrf inherits text_bm25's 1-row corpus-stats
    # crossJoin; sample_dsir crossJoins its 1-row (nt, nr) totals onto
    # the 64-row bucket frame (both audited 2026-08-15)
    "rank_rrf", "sample_dsir",
    # rank_ndcg: 1-row DCG frame crossJoins the 1-row IDCG constant,
    # plus the inherited text_bm25 stats crossJoin (audited 2026-08-15)
    "rank_ndcg",
}


def test_no_cartesian_or_unaudited_bnlj_plans(spark):
    """Sweep EVERY registered key's physical plan at sf0.001."""
    bad: list[tuple[str, str]] = []
    for key in sorted(REGISTRY):
        try:
            df = REGISTRY[key].fn(spark, SF0001)
            p = df._jdf.queryExecution().sparkPlan().toString()
        except Exception as e:  # pragma: no cover - build failure is its own bug
            bad.append((key, f"plan build failed: {e}"))
            continue
        if "CartesianProduct" in p:
            bad.append((key, "CartesianProduct in physical plan"))
        if "BroadcastNestedLoopJoin" in p and key not in _BNLJ_ALLOWED:
            bad.append(
                (key, "unaudited BroadcastNestedLoopJoin — verify the "
                      "broadcast side is bounded, then add to _BNLJ_ALLOWED")
            )
    assert not bad, bad
