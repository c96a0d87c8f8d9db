"""SparkSession builder with the engine's required configuration.

Scale notes (100 TB target, SURVEY.md §4):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  runtime broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a
  real cluster set it ≈ 2-3× total cores and let AQE coalesce.
- Arrow enabled for the pandas-UDF operators (vectorized Python exchange).
- The legacy nanos conf is kept so a TIMESTAMP(NANOS)-era ``events``
  fixture still reads (as int64 nanos); the current fixture is
  TIMESTAMP(MICROS) and needs no conf. sources/loader.py dispatches on
  the dtype actually read and also pins the confs at runtime for
  sessions we did not build (the driver's own session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapreduce-server-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ≈ cores; AQE coalesces below this at runtime.
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce by advisory size (64 MB), not up to the parallelism cap:
        # the Spark docs recommend false on busy clusters for efficient
        # resource use; locally it stops tiny shuffles fanning into 32
        # one-row tasks (pure scheduling overhead at any scale).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Round-13 measured-and-rejected default (guide §3.1): AQE's
        # runtime SMJ→shuffled-hash conversion
        # (maxShuffledHashJoinLocalMapThreshold=64m) won 11-51% on the
        # SMJ-planned keys in isolation (join_full 0.22→0.11 s,
        # graph_wcc 0.16→0.12 s, ts_granger 0.35→0.29 s, rank_rrf
        # 0.68→0.61 s; noop sink, median of 3) — but alternating
        # bench.py runs at matched calibration showed it adds a uniform
        # per-collect AQE cost that regressed the 7-query headline
        # serving path ~35% (ON 0.81/1.25 s vs OFF 0.59/0.85 s). The
        # default therefore stays OFF (0); a cluster deployment whose
        # jobs are dominated by large sort-merge joins rather than
        # repeated short collects can opt in via the env knob.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "0"),
        )
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
