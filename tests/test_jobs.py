"""Generic job builders over non-fixture DataFrames (the migrating-user
surface: same jobs, arbitrary input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_server_spark import jobs


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a c c")], "id long, body string"
    )


def test_word_count(spark):
    got = {(r.word, r.cnt) for r in jobs.word_count(_corpus(spark), "body").collect()}
    assert got == {("a", 3), ("b", 2), ("c", 3)}


def test_grep(spark):
    got = jobs.grep(_corpus(spark), "a b", "body").collect()
    assert [r.body for r in got] == ["a b a"]


def test_inverted_index(spark):
    got = {r.word: r.postings for r in jobs.inverted_index(_corpus(spark), "id", "body").collect()}
    assert got == {"a": [1, 3], "b": [1, 2], "c": [2, 3]}


def test_top_k_and_sort(spark):
    df = spark.createDataFrame([(i, i * 7 % 5) for i in range(20)], "i long, v long")
    top = jobs.top_k(df, 3, F.desc("v"), F.asc("i")).collect()
    assert [(r.i, r.v) for r in top] == sorted(
        [(i, i * 7 % 5) for i in range(20)], key=lambda t: (-t[1], t[0])
    )[:3]
    full = jobs.total_sort(df, F.asc("v"), F.asc("i")).collect()
    assert [(r.i, r.v) for r in full] == sorted(
        [(i, i * 7 % 5) for i in range(20)], key=lambda t: (t[1], t[0])
    )


def test_kv_aggregate_and_histogram(spark):
    df = spark.createDataFrame([(i % 3, float(i)) for i in range(12)], "k long, v double")
    agg = {
        (r.k): (r.n, r.s)
        for r in jobs.key_value_aggregate(
            df, ["k"], [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")]
        ).collect()
    }
    assert agg[0] == (4, 0 + 3 + 6 + 9)
    hist = {r.bucket: r.n for r in jobs.histogram(df, "v", 5.0).collect()}
    assert hist == {0: 5, 1: 5, 2: 2}
