#!/usr/bin/env python
"""Time queries against the no-op sink (guide §1.4): computes every
column of every row and discards it, so the number is the distributed
computation alone — no driver collect, no Arrow/pickle fetch, no
result-size bias. Complements bench.py (the driver gate, collect()
included) and tools/bench_full.py (breadth, collect() included);
this is the optimization round's isolation instrument.

Round-14 methodology fix (VERDICT r13 #2 — the r13 instrument's warm-up
filled ``.cache()``'d subtrees, so its "full recompute" excluded cache
fills): each timed run now measures a genuinely COLD execution —

- ``spark.catalog.clearCache()`` + the operator-layer frame memos
  (operators._memo.clear_frame_cache, the IVF assignment cache) are
  cleared BEFORE the timed region, and
- the timed region is a FRESH plan build (``spec.raw_fn``) plus the
  noop write, so plan analysis/codegen, every in-query cache FILL, and
  any build-time driver-side work (e.g. knn_mmr's K-bounded collects)
  are paid exactly once inside the measurement — the cost a cold
  deployment actually pays per query.

Deliberately kept WARM across runs (the documented ingest-time
artifacts, not per-query work): driver-side training memos
(_QV_CACHE / _IVF_CACHE centroids / _KCENTER_CACHE — small collected
VALUES built once per corpus) and the on-disk IVF index
(tags=("side_effects",) materialization). The boundary is "Spark-side
cached frames are per-query cost; ingest-time artifacts are not", and
it is symmetric before/after within this round's sweeps.

Numbers are therefore NOT comparable with plans/r13/noop_sweep_*.csv
(whose runs reused warm caches and a memoized plan); the round-14
baseline is plans/r14/noop_sweep_before.csv, same methodology both
sides.

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
from mapreduce_server_spark.operators import _memo  # noqa: E402
from mapreduce_server_spark.operators import similarity  # noqa: E402
from mapreduce_server_spark.session import get_spark  # noqa: E402


def clear_query_caches(spark) -> None:
    """Drop every Spark-side cached frame so the next build re-registers
    and the next action pays the fill: the catalog cache (covers bare
    in-operator ``.cache()`` sites of the frame about to be rebuilt),
    the _memo session frames, and the IVF assignment cache. Driver-side
    value memos and disk indexes stay warm (module docstring)."""
    _memo.clear_frame_cache()
    for d in list(similarity._IVF_ASSIGN_CACHE.values()):
        try:
            d.unpersist()
        except Exception:
            pass
    similarity._IVF_ASSIGN_CACHE.clear()
    spark.catalog.clearCache()


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
        # warm-up: JIT/codegen/Arrow first-touch, NOT cache state — the
        # caches it fills are cleared again before every timed run.
        clear_query_caches(spark)
        sc.setJobDescription(f"noop-warmup: {key}")
        spec.raw_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ts = []
        for i in range(runs):
            clear_query_caches(spark)
            sc.setJobDescription(f"noop: {key} run {i}")
            t0 = time.perf_counter()
            df = spec.raw_fn(spark, sf_dir)  # fresh plan: build is timed
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        med = sorted(ts)[len(ts) // 2]
        print(f"{key},{med:.4f},{min(ts):.4f},{max(ts):.4f}", flush=True)


if __name__ == "__main__":
    main()
