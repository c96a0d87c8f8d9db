"""The Python DataSource API contract: partition planning, deterministic
per-split generation, and composability with ordinary DataFrame plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_server_spark.sources.pysource import SynthDocs, doc_row


def _read(spark, rows: int, parts: int):
    spark.dataSource.register(SynthDocs)
    return (
        spark.read.format("synthdocs")
        .option("rows", str(rows))
        .option("parts", str(parts))
        .load()
    )


def test_synthdocs_partitioned_read(spark):
    df = _read(spark, 1000, 8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    assert df.select("doc_id").distinct().count() == 1000


def test_synthdocs_deterministic_and_matches_reference(spark):
    """Rows are a pure function of doc_id: re-reading (new scan, new
    tasks) yields identical content, equal to the driver-side reference
    implementation row for row."""
    sample = {
        r.doc_id: (r.text, r.lang)
        for r in _read(spark, 50, 3).collect()
    }
    again = {
        r.doc_id: (r.text, r.lang)
        for r in _read(spark, 50, 5).collect()  # different split count
    }
    assert sample == again
    for doc_id in (0, 17, 49):
        _, text, lang = doc_row(doc_id)
        assert sample[doc_id] == (text, lang)


def test_synthdocs_composes_with_dataframe_ops(spark):
    """The source output is an ordinary DataFrame — aggregate over it."""
    df = _read(spark, 400, 4)
    by_lang = {r.lang: r.n for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(by_lang.values()) == 400
    assert set(by_lang) <= {"en", "de", "fr", "ja"}


def test_synthdocs_streaming_delivers_all_rows_in_batches(spark):
    """The streaming contract: offsets advance rowsPerBatch at a time,
    the drain delivers ids [0, maxRows) exactly once, and rows equal the
    batch source's (same pure generator — deterministic replay IS the
    recovery story)."""
    import os
    import shutil

    from mapreduce_server_spark.streaming import twins

    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "pysource_stream_ckpt",
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    spark.dataSource.register(SynthDocs)
    stream = (
        spark.readStream.format("synthdocs")
        .option("rowsPerBatch", "50")
        .option("maxRows", "150")
        .load()
    )
    assert stream.isStreaming
    # availableNow treats one read() as "all available" for simple stream
    # readers — drive a continuous trigger and stop once the source is
    # drained (offsets past maxRows yield empty batches).
    import time

    rows: list = []
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _id: rows.extend(bdf.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while len(rows) < 150 and time.monotonic() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(r.doc_id for r in rows) == list(range(150))
    sample = {r.doc_id: (r.text, r.lang) for r in rows}
    for doc_id in (0, 77, 149):
        _, text, lang = doc_row(doc_id)
        assert sample[doc_id] == (text, lang)


def test_jsonlcommit_writer_two_phase_commit(spark):
    """The writer contract: tasks stage to temp files, commit() renames —
    after a successful write the directory holds ONLY final part files
    whose union equals the input; a mid-write task failure leaves no
    visible partial output on retry-free abort."""
    import json
    import os
    import shutil

    from mapreduce_server_spark.sources.pysource import JsonlCommit

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "jsonlcommit_out",
    )
    shutil.rmtree(out, ignore_errors=True)
    spark.dataSource.register(JsonlCommit)
    df = _read(spark, 200, 5)
    df.write.format("jsonlcommit").option("path", out).mode("append").save()

    files = sorted(os.listdir(out))
    assert files and all(f.startswith("part-") for f in files)  # no temp residue
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["doc_id"] for r in rows) == list(range(200))
    back = {r["doc_id"]: (r["text"], r["lang"]) for r in rows}
    for doc_id in (0, 99, 199):
        _, text, lang = doc_row(doc_id)
        assert back[doc_id] == (text, lang)
