#!/usr/bin/env python
"""Scaling evidence: run the headline queries at every fixture scale
factor and report per-query wall time plus the sf0.01→sf0.1 scaling
exponent — the "would this survive 100×?" measurement the plan audit
argues qualitatively. Writes SCALING.md.

Method matches bench.py (median of 3 timed runs after 1 warm-up,
collect() included, plan build excluded) so numbers are comparable.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]


def main() -> int:
    from pyspark.sql import SparkSession

    from bench import HEADLINE
    from mapreduce_server_spark import REGISTRY

    keys = list(HEADLINE)  # the exact bench-gate query set
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scaling-report")
        .config("spark.sql.shuffle.partitions", cpus)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {k: {} for k in keys}
    for sf, sf_dir in SFS:
        for k in keys:
            fn = REGISTRY[k].raw_fn
            df = fn(spark, sf_dir)
            df.collect()  # warm-up (fills scan caches, JIT)
            times = []
            for _ in range(3):
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.collect()
                times.append(time.perf_counter() - t0)
            results[k][sf] = statistics.median(times)
            print(f"sf{sf} {k}: {results[k][sf]:.3f}s", flush=True)

    lines = [
        "# SCALING — headline queries across fixture scale factors "
        "(generated)",
        "",
        f"`python tools/scaling_report.py` on local[{cpus}]; median of 3",
        "runs after warm-up, collect() included. `exp` is the empirical",
        "scaling exponent log10(t_sf0.1 / t_sf0.01) — 1.0 means linear in",
        "data size, < 1 means fixed overheads still dominate at sf0.1,",
        "> 1 flags super-linear growth (the 100 TB red flag).",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | exp |",
        "| --- | --- | --- | --- | --- |",
    ]
    import math

    worst = 0.0
    for k in keys:
        r = results[k]
        exp = math.log10(r["0.1"] / r["0.01"]) if r["0.01"] > 0 else float("nan")
        worst = max(worst, exp)
        lines.append(
            f"| {k} | {r['0.001']:.3f} | {r['0.01']:.3f} | {r['0.1']:.3f} "
            f"| {exp:.2f} |"
        )
    lines += [
        "",
        f"Worst exponent this run: **{worst:.2f}** (sub-linear ⇒ runtime",
        "is still overhead-bound at sf0.1; anything approaching ~1 scales",
        "with data as expected, and anything well past 1 would be a",
        "scale hazard to fix).",
        "",
    ]
    out = os.path.join(REPO, "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
