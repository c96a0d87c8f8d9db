"""Property-based differential testing (SURVEY §5.2 item 6): random small
frames through closed operator compositions, Spark vs DuckDB, exact
compare. Complements the fixture parity gate with adversarial shapes the
fixtures can't contain (empty groups, all-equal keys, negative ints,
duplicate rows)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),  # k: heavy key collisions
        st.integers(min_value=-1000, max_value=1000),  # v
        st.sampled_from(["a", "b", "c", ""]),  # s
    ),
    min_size=0,
    max_size=40,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _pdf(rows):
    return pd.DataFrame(rows, columns=["k", "v", "s"]).astype(
        {"k": "int64", "v": "int64", "s": "object"}
    )


def _both(spark, rows, spark_fn, sql):
    pdf = _pdf(rows)
    sdf = spark.createDataFrame(pdf, schema="k long, v long, s string")
    got = sorted(map(tuple, spark_fn(sdf).collect()))
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


@SETTINGS
@given(rows=ROWS)
def test_groupby_agg(spark, rows):
    from pyspark.sql import functions as F

    _both(
        spark,
        rows,
        lambda df: df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.min("s").alias("ms"),
        ),
        "SELECT k, count(*) AS n, sum(v)::BIGINT AS sv, min(s) AS ms FROM t GROUP BY k",
    )


@SETTINGS
@given(rows=ROWS)
def test_distinct_and_filter(spark, rows):
    from pyspark.sql import functions as F

    _both(
        spark,
        rows,
        lambda df: df.filter((F.col("v") % 2 == 0) & (F.col("s") != "")).distinct(),
        "SELECT DISTINCT k, v, s FROM t WHERE v % 2 = 0 AND s <> ''",
    )


@SETTINGS
@given(rows=ROWS)
def test_self_join_counts(spark, rows):
    from pyspark.sql import functions as F

    _both(
        spark,
        rows,
        lambda df: df.select("k", "v")
        .alias("a")
        .join(df.select(F.col("k").alias("k2"), F.col("v").alias("v2")), F.col("k") == F.col("k2"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_pairs")),
        """SELECT a.k, count(*) AS n_pairs
           FROM (SELECT k, v FROM t) a JOIN (SELECT k, v FROM t) b ON a.k = b.k
           GROUP BY a.k""",
    )


@SETTINGS
@given(rows=ROWS)
def test_window_rownum(spark, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("k").orderBy(F.desc("v"), F.asc("s"))
    _both(
        spark,
        rows,
        lambda df: df.dropDuplicates(["k", "v", "s"]).withColumn(
            "rn", F.row_number().over(w)
        ),
        """SELECT k, v, s,
                  row_number() OVER (PARTITION BY k ORDER BY v DESC, s) AS rn
           FROM (SELECT DISTINCT k, v, s FROM t)""",
    )


@SETTINGS
@given(rows=ROWS)
def test_union_except(spark, rows):
    from pyspark.sql import functions as F

    _both(
        spark,
        rows,
        lambda df: df.select("k").unionByName(
            df.filter(F.col("v") > 0).select("k")
        ).exceptAll(df.filter(F.col("s") == "a").select("k")),
        """SELECT k FROM (
             SELECT k FROM t UNION ALL SELECT k FROM t WHERE v > 0
           ) EXCEPT ALL SELECT k FROM t WHERE s = 'a'""",
    )


@SETTINGS
@given(rows=ROWS)
def test_running_sum_prefixes(spark, rows):
    """Running ROWS-frame sums agree with DuckDB for arbitrary int data
    (the window-ordering + frame semantics, not just the fixture shape)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("k")
        .orderBy("v", "s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    _both(
        spark,
        rows,
        lambda df: df.dropDuplicates(["k", "v", "s"]).select(
            "k", "v", "s", F.sum("v").over(w).alias("run")
        ),
        """SELECT k, v, s,
                  sum(v) OVER (PARTITION BY k ORDER BY v, s
                               ROWS UNBOUNDED PRECEDING)::BIGINT AS run
           FROM (SELECT DISTINCT k, v, s FROM t)""",
    )


@SETTINGS
@given(rows=ROWS)
def test_gap_sessionization_invariants(spark, rows):
    """Gap-based session ids (the stream_session algorithm) on arbitrary
    int 'timestamps': same flag→running-sum form on both engines."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = lambda df: df.dropDuplicates(["k", "v"]).select("k", "v")  # noqa: E731
    w = Window.partitionBy("k").orderBy("v")
    run = Window.partitionBy("k").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    def spark_fn(df):
        d = base(df)
        flag = F.when(
            F.lag("v").over(w).isNull() | (F.col("v") - F.lag("v").over(w) > 100), 1
        ).otherwise(0)
        return d.withColumn("sid", F.sum(flag).over(run))

    _both(
        spark,
        rows,
        spark_fn,
        """WITH d AS (SELECT DISTINCT k, v FROM t),
        f AS (SELECT k, v,
                     CASE WHEN lag(v) OVER w IS NULL OR v - lag(v) OVER w > 100
                          THEN 1 ELSE 0 END AS flag
              FROM d WINDOW w AS (PARTITION BY k ORDER BY v))
        SELECT k, v, sum(flag) OVER (PARTITION BY k ORDER BY v
                                     ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
        FROM f""",
    )
