"""Pin the driver's 50-key grading window.

The correctness driver grades the FIRST 50 keys of ``sorted(queries())``.
Round over round, that window must stay byte-identical, or driver
evidence stops being comparable (and a key that silently enters the
window starts being graded with zero prior history). STATUS.md's naming
rule: every NEW registry key must sort alphabetically AFTER
``graph_triangles_ordered`` (in practice: avoid new ``a``–``g`` prefixes
such as agg_*/dedup_*/emb_*/filter_*/funnel_*/graph_* — name vector ops
knn_*, anomaly ops ts_*, etc.).
"""

from __future__ import annotations

import __spark_entry__ as entry

# Frozen at round 6 (46 oracle-graded green + 4 rows-only, zero err).
DRIVER_WINDOW = [
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_argmax",
    "agg_bool",
    "agg_collect",
    "agg_corr",
    "agg_cube",
    "agg_distinct",
    "agg_global",
    "agg_group",
    "agg_grouping_sets",
    "agg_having",
    "agg_histogram",
    "agg_mode",
    "agg_multi",
    "agg_percentile",
    "agg_pivot",
    "agg_rollup",
    "agg_salted",
    "agg_sample",
    "agg_stats",
    "agg_unpivot",
    "anomaly_zscore",
    "cohort_retention",
    "concurrency_peak",
    "cooccur_parts",
    "decontaminate",
    "dedup_components",
    "dedup_embedding",
    "dedup_exact",
    "dedup_exact_hash",
    "dedup_jaccard_prefix",
    "dedup_levenshtein",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "distinct_rows",
    "dq_constraints",
    "dq_freshness",
    "dq_profile",
    "emb_label_centroids",
    "emb_quantize",
    "filter_grep",
    "filter_in_between",
    "filter_pred",
    "funnel_stages",
    "graph_pagerank",
    "graph_reverse_links",
    "graph_triangles",
    "graph_triangles_ordered",
]


def test_driver_window_is_pinned():
    got = sorted(entry.queries())[:50]
    assert got == DRIVER_WINDOW, (
        "The driver's 50-key alphabetical grading window shifted. A new "
        "registry key sorts before 'graph_triangles_ordered', which would "
        "silently change WHICH queries the correctness driver grades and "
        "break round-over-round evidence comparability. Per the STATUS.md "
        "naming rule, rename the new key so it sorts after 'graph_*' "
        "(e.g. knn_* instead of emb_*, ts_* instead of anomaly_*). "
        f"Unexpected entrants: {sorted(set(got) - set(DRIVER_WINDOW))}; "
        f"evicted: {sorted(set(DRIVER_WINDOW) - set(got))}"
    )
