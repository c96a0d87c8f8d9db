#!/usr/bin/env python
"""Time queries against the no-op sink (guide §1.4): computes every
column of every row and discards it, so the number is the distributed
computation alone — no driver collect, no Arrow/pickle fetch, no
result-size bias. Complements bench.py (the driver gate, collect()
included) and tools/bench_full.py (breadth, collect() included);
this is the optimization round's isolation instrument.

Usage: python tools/bench_noop.py [sf_dir] [key ...]
  (no keys → every registered key; writes one line per key, CSV-ish)

Env: SPARK_GRAFT_NOOP_RUNS (default 3) timed runs per key after one
warm-up; the median is reported.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduce_server_spark import REGISTRY  # noqa: E402
from mapreduce_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    keys = args[1:] or sorted(REGISTRY)
    runs = int(os.environ.get("SPARK_GRAFT_NOOP_RUNS", "3"))

    spark = get_spark(app_name="mrss-bench-noop")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for key in keys:
        spec = REGISTRY[key]
        df = spec.fn(spark, sf_dir)
        sc.setJobDescription(f"noop-warmup: {key}")
        df.write.format("noop").mode("overwrite").save()  # warm-up
        ts = []
        for i in range(runs):
            sc.setJobDescription(f"noop: {key} run {i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        med = sorted(ts)[len(ts) // 2]
        print(f"{key},{med:.4f},{min(ts):.4f},{max(ts):.4f}", flush=True)


if __name__ == "__main__":
    main()
