"""Text / CSV / JSON ingestion (SURVEY.md §2 cat. A, Hadoop InputFormat
parity — ``TextInputFormat`` (offset,line) pairs, delimited and JSON
record readers).

No fixture files exist in these formats (SURVEY §2.A: loader utilities
only, no registered query); tests/test_ingest.py round-trips each format
through the scratch dir.

Engine policy: **schemas are explicit**. ``inferSchema``/sampling reads
the data twice and guesses types per-run — at 100 TB that is both a full
extra pass and a correctness hazard (a later file can silently widen a
column). Callers pass DDL strings, mirroring the fixed StructType model
of §1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str, with_offsets: bool = False) -> DataFrame:
    """Lines of text; with_offsets=True adds the Hadoop-style per-file
    line position (the (offset, line) KV pair of TextInputFormat —
    expressed as (file, pos, line) since byte offsets are reader-private)."""
    df = spark.read.text(path)
    if not with_offsets:
        return df
    from pyspark.sql import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    return df.select(
        F.input_file_name().alias("file"),
        (F.row_number().over(w) - 1).alias("pos"),
        F.col("value").alias("line"),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Delimited records with a mandatory explicit schema (DDL string)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "FAILFAST")  # bad records are bugs, not rows to drop
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines records with a mandatory explicit schema."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """The MR sink (R reducers → R output files [MR04 §3.1]) as a
    partitioned columnar layout — the write side of partition pruning."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar format with embedded schema and
    min/max stripe statistics (predicate pushdown works like parquet's
    row groups; no DDL needed, the footer carries the types)."""
    return spark.read.orc(path)


def quantize_measures(
    df: DataFrame, cols: list[str], scale: int = 2
) -> DataFrame:
    """Quantize measure doubles to the engine's fixed-point quantum —
    the ingest-side enforcement of the ARCHITECTURE §23 contract.

    The engine's measure columns are fixed-point values at a documented
    quantum (default: 2 dp money). Sub-quantum doubles are out of the
    parity/replay contract: decimal quantization of a finer double is
    engine-specific (DuckDB's double→DECIMAL cast is not correctly
    rounded; the round-12 ×0.1 probe diverged on 44 keys before
    re-quantizing), and a defined quantum is what makes the decimal-sum
    discipline's aggregates associative, fold-order-free and replayable
    at 100 TB. Ingest — this function — owns the rounding, ONCE, before
    any operator sees the column; everything downstream may then treat
    decimal casts as exact.

    Non-finite values (NaN/±Inf — bad sensors, upstream 0/0) map to
    NULL, SQL's missing-value representation: NaN at rest is also out
    of contract, because a decimal cast of NaN THROWS on both engines
    (DuckDB "can't be cast", Spark ANSI CAST_INVALID_INPUT) — one bad
    row must not crash every measure aggregate — and NaN's
    engine-specific ordering/equality semantics would poison ranks and
    group keys where NULL's are adjudicated (ARCHITECTURE §22).

    Enforcement split (round 13): this function is the NORMALIZER a
    caller applies when ingesting a foreign corpus; the LOAD path
    additionally VALIDATES the contract (``loader.validate_measure_
    contract``, opt-in via ``SPARK_GRAFT_VALIDATE_MEASURES=1`` — the
    driver_sim verification surface sets it) rather than silently
    re-quantizing, because rounding at load would mask the ingest bug
    the contract exists to catch."""
    out = df
    for c in cols:
        col = F.col(c)
        finite = ~F.isnan(col) & (F.abs(col) != F.lit(float("inf")))
        out = out.withColumn(c, F.when(finite, F.round(col, scale)))
    return out
