#!/usr/bin/env python
"""Benchmark the headline queries; prints ONE JSON line for the driver.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32). Method mirrors BASELINE.md (warm runs, timing includes
collect(), cold JVM start excluded) with a noise-robust median of 5 timed
runs after one warm-up — round-7 showed a ±30% run-to-run band on a busy
host, and the median of 5 is a fairer estimator of the same quantity.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_server_spark import REGISTRY  # noqa: E402
from mapreduce_server_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_join_topk",
    "win_rownum_topk",
    "stream_tumbling",
    "text_wordcount",
    "knn_bruteforce",
    "dedup_exact",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="mrss-bench")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for key in HEADLINE:
        spec = REGISTRY.get(key)
        if spec is None:
            continue
        spec.fn(spark, sf_dir).collect()  # warm-up
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        times[key] = round(sorted(runs)[2], 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
