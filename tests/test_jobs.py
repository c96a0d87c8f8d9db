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


def test_exact_dedup_min_survivor(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], "id long, body string"
    )
    got = {(r.id, r.body) for r in jobs.exact_dedup(df, ["body"], "id").collect()}
    assert got == {(1, "x"), (2, "y")}


def test_near_dedup_jaccard_generic(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),   # exact copy of 1 → jaccard 1.0
            (3, "a b c d e zzz"), # near copy
            (4, "q r s t u v"),   # unrelated
        ],
        "id long, body string",
    )
    rows = {(r.id_a, r.id_b): r.jaccard for r in jobs.near_dedup_jaccard(df, "id", "body", 0.4).collect()}
    assert rows[(1, 2)] == 1.0
    assert (1, 3) in rows and (2, 3) in rows
    assert not any(4 in pair for pair in rows)


def test_sessionize_generic(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),
            (1, "2024-01-01 11:30:00"),  # > 30 min gap → new session
            (2, "2024-01-01 09:00:00"),
        ],
        "uid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.uid, r.ts.isoformat(), r.session_id)
        for r in jobs.sessionize(df, "uid", "ts", "30 minutes").collect()
    }
    assert got == {
        (1, "2024-01-01T10:00:00", 1),
        (1, "2024-01-01T10:10:00", 1),
        (1, "2024-01-01T11:30:00", 2),
        (2, "2024-01-01T09:00:00", 1),
    }


def test_knn_topk_generic(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1]), (4, [-1.0, 0.0])],
        "id long, vec array<double>",
    )
    rows = jobs.knn_topk(df, "id", "vec", [1.0, 0.0], k=2).collect()
    assert [r.id for r in rows] == [1, 3]
    assert rows[0].cos_sim == 1.0


def test_forward_fill_generic(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, None), (1, 3, 30.0), (1, 4, None), (2, 1, None)],
        "k long, o long, v double",
    )
    got = {(r.k, r.o): r.v for r in jobs.forward_fill(df, "k", "o", ["v"]).collect()}
    assert got == {(1, 1): 10.0, (1, 2): 10.0, (1, 3): 30.0, (1, 4): 30.0, (2, 1): None}
