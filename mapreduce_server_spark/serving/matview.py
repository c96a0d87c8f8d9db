"""Materialized views with partition-incremental refresh.

The recurring-workload pattern (the VLDB'15 reuse line in PAPERS.md): a
dashboard aggregate re-run hourly over an append-only 100 TB event log
should not rescan history — only the partitions that gained data since the
last refresh. This module materializes an aggregate partitioned on a
coarse key (e.g. day) and refreshes by set difference:

    new = distinct partition keys in source  −  keys already materialized

then rebuilds ONLY those partitions with the partition predicate pushed
into the source scan (partition pruning makes the rescan proportional to
the new data, not to history), and appends them via dynamic partition
overwrite (idempotent per partition — a re-run of the same refresh
replaces, never duplicates).

Correctness domain: exact for sources that are append-only at partition
granularity (closed partitions never gain rows). A source that back-fills
an already-materialized partition needs the partition marked dirty —
``refresh(force=[...])`` — or a watermark-delayed refresh policy; that
staleness contract is the standard one for log-structured MVs.

Scale notes: the key-discovery scan reads only the partition column
(column pruning) and aggregates to |distinct keys| rows; the MV listing
reads parquet partition directories (no data IO). Each refresh shuffles
only the new partitions' rows, once, on the aggregate's group keys.
"""

from __future__ import annotations

import os
import urllib.parse
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scratch import SCRATCH, owned

#: build(spark, sf_dir, keys) → aggregated DataFrame containing ONLY the
#: given partition-key values (keys=None → all). The build closure owns
#: pushing `keys` into its source filter so partition pruning applies.
BuildFn = Callable[[SparkSession, str, "list | None"], DataFrame]

#: keys(spark, sf_dir) → single-column DataFrame of the source's distinct
#: partition keys. Kept separate from build so discovery is a column-pruned
#: scan + distinct of the partition key alone — never the full aggregate.
KeysFn = Callable[[SparkSession, str], DataFrame]


class MaterializedView:
    def __init__(
        self, name: str, partition_col: str, keys: KeysFn, build: BuildFn
    ):
        self.name = name
        self.partition_col = partition_col
        self.keys = keys
        self.build = build

    def path(self, sf_dir: str) -> str:
        # pid-tagged: the MV is process-private serving state (like the
        # IVF index) — concurrent applications each refresh their own
        # copy rather than racing one directory; atexit reclaims it.
        tag = os.path.basename(os.path.normpath(sf_dir))
        return owned(
            os.path.join(SCRATCH, "matviews", f"{self.name}_{tag}_p{os.getpid()}")
        )

    #: directory name Spark writes for a NULL partition value — never a
    #: source key string, so it must not enter the set difference
    _NULL_SENTINEL = "__HIVE_DEFAULT_PARTITION__"

    def materialized_keys(self, sf_dir: str) -> set[str]:
        """Partition keys already materialized — from the partition
        directory names (no data IO). Directory names carry Hive
        partition-value escaping (':' → '%3A', etc.), so unquote before
        comparing against source-key strings — otherwise any escaped key
        never matches and refresh() rebuilds it every call (correct but
        never incremental)."""
        out = self.path(sf_dir)
        if not os.path.isdir(out):
            return set()
        prefix = f"{self.partition_col}="
        return {
            urllib.parse.unquote(raw)
            for raw in (
                d[len(prefix):] for d in os.listdir(out) if d.startswith(prefix)
            )
            if raw != self._NULL_SENTINEL
        }

    def refresh(
        self, spark: SparkSession, sf_dir: str, force: list[str] | None = None
    ) -> list[str]:
        """Materialize missing (plus ``force``-dirtied) partitions; returns
        the partition keys actually rebuilt."""
        src_keys = {str(r[0]) for r in self.keys(spark, sf_dir).collect()}
        todo = sorted((src_keys - self.materialized_keys(sf_dir)) | set(force or []))
        return self.rebuild(spark, sf_dir, todo)

    def rebuild(
        self, spark: SparkSession, sf_dir: str, keys: list[str]
    ) -> list[str]:
        """Rebuild exactly the given partition keys (no discovery scan)."""
        if not keys:
            return []
        df = self.build(spark, sf_dir, keys)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(self.partition_col)
            .parquet(self.path(sf_dir))
        )
        return keys

    def stream_refresh(
        self,
        spark: SparkSession,
        sf_dir: str,
        stream_df: DataFrame,
        key_expr,
        checkpoint: str,
        rebuilt_log: list | None = None,
    ):
        """Streaming incremental maintenance: each micro-batch's distinct
        partition keys become the dirty set, and ONLY those partitions are
        rebuilt (from the batch source, with the key predicate pushed into
        the scan) — no key-discovery scan at all; the stream IS the
        change-capture. foreachBatch + checkpoint make it exactly-once at
        partition granularity: a replayed batch re-marks the same keys
        dirty and the dynamic-partition overwrite is idempotent. This is
        the serving loop a 100 TB dashboard runs: append-only log →
        dirty-day detection from the stream → partition-pruned rebuild.

        Returns the started StreamingQuery (caller awaits termination);
        ``rebuilt_log`` (if given) collects the per-batch rebuilt keys.
        """

        def sink(batch_df: DataFrame, _batch_id: int) -> None:
            dirty = sorted(
                str(r[0])
                for r in batch_df.select(key_expr.alias("k")).distinct().collect()
            )
            done = self.rebuild(spark, sf_dir, dirty)
            if rebuilt_log is not None and done:
                rebuilt_log.append(done)

        return (
            stream_df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def read(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        """The materialized relation; the partition column comes back as
        string (its on-disk directory form) regardless of type inference.

        An EMPTY source never materializes anything (rebuild([]) writes
        no directory), so a missing path reads as the empty relation in
        the view's own schema — build() over an empty key list is that
        frame analysis-time for free (round-10 empty-input sweep).

        The empty-frame substitution applies ONLY to the genuinely-empty
        source: a missing directory when the source HAS keys means the
        caller skipped refresh() (or a refresh failed mid-flight), and
        silently serving zero rows there would be a correctness bug —
        raise instead (round-10 ADVICE)."""
        if not os.path.isdir(self.path(sf_dir)):
            if self.keys(spark, sf_dir).limit(1).count() > 0:
                raise FileNotFoundError(
                    f"materialized view '{self.name}' has no materialization "
                    f"at {self.path(sf_dir)} but its source has partition "
                    "keys — call refresh() before read()"
                )
            df = self.build(spark, sf_dir, [])
        else:
            df = spark.read.parquet(self.path(sf_dir))
        return df.withColumn(
            self.partition_col, F.col(self.partition_col).cast("string")
        )
