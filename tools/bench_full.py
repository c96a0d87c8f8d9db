#!/usr/bin/env python
"""Time EVERY registered query at a scale factor and regenerate FULLBENCH.md.

Complements bench.py (the driver's 7-query headline gate) with full-registry
evidence: per-query wall time (one timed run after one warm-up, collect()
included), grouped by category, slowest queries called out. Also a scale
smoke: a query that is correct at sf0.01 but mis-planned can only be caught
by running it bigger.

Usage: python tools/bench_full.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduce_server_spark import REGISTRY  # noqa: E402
from mapreduce_server_spark.session import get_spark  # noqa: E402

#: Deliberate cost-ladder demos: each exists to MEASURE a slow surface
#: against its fast built-in twin (named in the docstring). Kept in the
#: run for the measurement, but marked in the report and excluded from
#: the comparable total so the breadth number reflects the recommended
#: plans, not the pedagogical anti-patterns.
PEDAGOGICAL_DEMOS = {
    "udf_cogroup_asof": (
        "per-key pandas cogroup on a deterministic 10% user slice; "
        "fast twin = join_asof (~65x at equal input)"
    ),
    "udf_python": "row-at-a-time Python UDF demo; built-in twin in-module",
}

#: Compute-bound rows whose cost is the algorithm, not a plan defect or
#: driver transfer — annotated so the slowest-ten table explains itself.
COMPUTE_NOTES = {
    "dedup_jaccard_prefix": (
        "exact AllPairs verification of ~310k candidates at t=0.5 "
        "(demo threshold; production near-dup t=0.9 keeps ~10% of postings)"
    ),
    "agg_sample": "the 10% hash-sample IS the output (60k rows by design)",
    "knn_filter": (
        "IVF-family quantizer assignment (K=16 literal-tree integer "
        "folds run interpreted) — same band as knn_ivf by construction"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="mrss-bench-full")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, tuple[float, int]] = {}
    for key in sorted(REGISTRY):
        spec = REGISTRY[key]
        spec.fn(spark, sf_dir)  # build + memoize the plan (not timed)
        spec.fn(spark, sf_dir).collect()  # warm-up run
        t0 = time.perf_counter()
        rows = spec.fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        results[key] = (dt, len(rows))
        print(f"{key:32s} {dt:8.3f}s {len(rows):>8d} rows", flush=True)

    by_cat: dict[str, list[str]] = defaultdict(list)
    for key in results:
        by_cat[REGISTRY[key].category].append(key)

    total = sum(t for t, _ in results.values())
    demo_total = sum(t for k, (t, _) in results.items() if k in PEDAGOGICAL_DEMOS)
    lines = [
        "# FULLBENCH — every registered query, one timed run (generated)",
        "",
        f"`python tools/bench_full.py {sf_dir}` — one warm-up then one timed",
        "run per query, `collect()` included, plan build excluded; "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].",
        "Method differs from bench.py (median-of-3) — this file is breadth",
        "evidence, bench.py is the gate.",
        "",
        f"**{len(results)} queries, {total:.1f} s total — "
        f"{total - demo_total:.1f} s excluding the "
        f"{len(PEDAGOGICAL_DEMOS)} marked cost-ladder demos** (deliberate",
        "slow-surface measurements with fast built-in twins; see table",
        "notes). Slowest ten:",
        "",
        "| query | sec | rows | note |",
        "| --- | --- | --- | --- |",
    ]
    for key, (dt, n) in sorted(results.items(), key=lambda kv: -kv[1][0])[:10]:
        note = PEDAGOGICAL_DEMOS.get(key, "") or COMPUTE_NOTES.get(key, "")
        if not note and n >= 100_000:
            note = f"collect-bound ({n} demo rows to driver; plan is scan+expr)"
        lines.append(f"| {key} | {dt:.3f} | {n} | {note} |")
    lines += ["", "## Per category", ""]
    for cat in sorted(by_cat):
        keys = by_cat[cat]
        cat_total = sum(results[k][0] for k in keys)
        lines.append(f"### {cat} — {len(keys)} queries, {cat_total:.2f} s")
        lines.append("")
        lines.append("| query | sec | rows |")
        lines.append("| --- | --- | --- |")
        for k in sorted(keys):
            dt, n = results[k]
            lines.append(f"| {k} | {dt:.3f} | {n} |")
        lines.append("")

    out = os.path.join(REPO, "FULLBENCH.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(results)} queries, {total:.1f}s total")


if __name__ == "__main__":
    main()
