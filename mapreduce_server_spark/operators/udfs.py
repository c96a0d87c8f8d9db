"""UDF / UDAF / UDTF surface (SURVEY.md §2 cat. K).

The reference's entire programming model is "run user code per record"
[MR04 §2]; in Spark that role is the UDF tiers. Engine policy (SURVEY §4):
built-ins first — each demo below intentionally computes something the
engine also offers natively, citing the built-in it benchmarks against.
Cost ladder (measured class gaps, not guesses):
row-Python UDF (pickle per row) ≪ pandas UDF (Arrow batches, ~10-100×
faster) ≪ built-in (JVM codegen). Python UDFs never appear in any other
operator module.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from ..registry import query
from ..sources.loader import Tables, load_table_fresh


@query(
    "udf_python",
    category="K.udf",
    oracle="""
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
FROM documents
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (≙ the MR user map fn): custom tokenizer
    token count. Equivalent built-in: ``F.size(F.split(...))`` — the UDF
    exists to prove the slow path gives identical results."""
    d = Tables(spark, sf_dir).documents

    @F.udf(returnType=LongType())
    def count_tokens(text) -> int:
        # None in, None out: a Python UDF sees NULL as None and must
        # spell SQL null-propagation itself (round-11 NULL-text axis)
        return None if text is None else len(text.split(" "))

    return d.select("doc_id", count_tokens("text").alias("n_tokens"))


@query(
    "udf_pandas_scalar",
    category="K.udf",
    oracle="""
SELECT event_id,
       CASE WHEN value > -1
            THEN round(ln(1 + value), 6) END AS log1p_value
FROM events
WHERE event_id % 10 = 0
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batch transfer): numpy log1p.
    Rounded to 6 dp — numpy/libm vs DuckDB ln may differ in the last
    ulp. Domain contract (round-12 negative-measure axis): log1p is
    NULL for value <= -1 on both engines — numpy would emit NaN (and a
    RuntimeWarning) where DuckDB ln THROWS, so the UDF masks the
    out-of-domain lanes to NaN (Arrow maps NaN → NULL, the same path a
    NULL input already takes) and the oracle CASE-guards. Demo rows
    capped by a deterministic modulo filter pushed to the scan
    (VERDICT r6 §next #2) — Arrow batching is what's demonstrated, not
    driver transfer."""
    ev = Tables(spark, sf_dir).events.filter(F.col("event_id") % 10 == 0)

    @F.pandas_udf(DoubleType())
    def log1p_vec(v: pd.Series) -> pd.Series:
        import numpy as np

        arr = v.to_numpy(dtype="float64")
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.log1p(arr)
        out[~(arr > -1.0)] = np.nan  # domain guard; NaN input stays NaN
        return pd.Series(out)

    return ev.select("event_id", F.round(log1p_vec("value"), 6).alias("log1p_value"))


@query(
    "udaf_pandas",
    category="K.udf",
    oracle="""
SELECT event_type, median(value) AS median_value
FROM events
GROUP BY event_type
""",
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: per-group median (a genuinely
    non-algebraic aggregate — needs the whole group, exactly what
    GROUPED_AGG ships to Python as one Arrow batch). Interpolated median
    matches DuckDB's definition on even counts ((a+b)/2, identical
    double arithmetic). Scale note: grouped-agg state is the full group —
    for 100 TB use approx_percentile(0.5) instead; this is the UDAF demo."""
    ev = Tables(spark, sf_dir).events

    @F.pandas_udf(DoubleType())
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return ev.groupBy("event_type").agg(median_udaf("value").alias("median_value"))


@query(
    "udtf_flatmap",
    category="K.udf",
    oracle="""
SELECT doc_id, g.i - 1 AS pos, toks[g.i] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 20 = 0) d,
     (SELECT unnest(generate_series(1, 512)) AS i) g
WHERE g.i <= len(toks)
""",
)
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF / flatMap (the MR map contract itself — 0..n records out per
    record in [MR04 §2.2]): positional tokenization via posexplode.
    Demo docs capped by a deterministic modulo filter pushed to the
    scan (VERDICT r6 §next #2)."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") % 20 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@query(
    "udtf_python",
    category="K.udf",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     c AS (SELECT doc_id, toks,
                  unnest(generate_series(0, (len(toks) - 1) // 50)) AS chunk_idx
           FROM t)
SELECT doc_id, chunk_idx,
       least(50, len(toks) - chunk_idx * 50) AS n_tokens,
       toks[chunk_idx * 50 + 1] AS first_token
FROM c
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based Python UDTF (Spark 4 table function API): chunk each
    document into 50-token windows — the training-data chunking shape —
    emitting (chunk_idx, n_tokens, first_token) per window via a LATERAL
    correlated call. Unlike udtf_flatmap (declarative posexplode, the
    right default), this is the escape hatch for row→table expansions
    with imperative per-row logic; row-at-a-time pickled worker, so the
    hot path should prefer built-ins or arrow-batched forms."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx BIGINT, n_tokens BIGINT, first_token STRING")
    class ChunkDoc:
        def eval(self, text):
            if text is None:
                return  # no chunks: mirrors generate_series(0, NULL)
            toks = text.split(" ")
            for i in range(0, len(toks), 50):
                c = toks[i : i + 50]
                yield (i // 50, len(c), c[0])

    spark.udtf.register("mrss_chunk_doc", ChunkDoc)
    Tables(spark, sf_dir).documents.createOrReplaceTempView("__mrss_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.first_token "
        "FROM __mrss_udtf_docs d, LATERAL mrss_chunk_doc(d.text) c"
    )


@query(
    "udf_cogroup_asof",
    category="K.udf",
    oracle="""
SELECT p.event_id, p.user_id, epoch_us(c.ts::TIMESTAMP) AS last_click_us
FROM (SELECT * FROM events
      WHERE event_type = 'purchase' AND user_id % 10 = 0) p
ASOF JOIN (SELECT * FROM events
           WHERE event_type = 'click' AND user_id % 10 = 0) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def udf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the two-sided Arrow UDF surface:
    both inputs are co-partitioned by user_id and each pair of per-key
    pandas frames is merged with ``pd.merge_asof`` (backward, inclusive
    — the exact ASOF semantics the DuckDB oracle executes natively, and
    the same result as the declarative ``join_asof`` row_number form).

    Where built-ins express the semantics (they do here — see
    join_asof), they win — measured 65× at sf0.1 full-corpus (0.14 s vs
    9 s, round-10 FULLBENCH.md): with thousands of small groups the
    per-group Python round-trip dominates, the cost-ladder lesson this K
    category exists to demonstrate. The demo runs on a DETERMINISTIC
    ``user_id % 10 = 0`` slice of both sides (oracle mirrors the
    predicate) so this deliberately-slow surface stays ~10% of its
    full-corpus wall and stops drowning real operators out of the
    FULLBENCH slowest-ten — hundreds of per-user groups remain, so the
    per-group-round-trip lesson (and the ratio vs the twin, measured at
    the same slice) is intact. Cogroup earns its keep when the per-key merge logic
    is genuinely imperative (bid/ask book replay, trajectory alignment)
    and groups are large enough to amortize the Arrow hop. Scale shape: ONE co-partitioned shuffle of each side —
    candidate pairs never materialize (the row_number form builds all
    (purchase × earlier-click) pairs before pruning; merge_asof walks
    the two sorted frames linearly), per-key memory is the two group
    frames, and ties on identical click ts collapse to the same output
    row either way.

    The click side reads a FRESH scan (load_table_fresh): a self-cogroup
    sharing one scan lineage gets its re-aliased right side mis-pruned to
    the grouping keys under count() (Spark 4.1; see loader docstring)."""
    ev = Tables(spark, sf_dir).events
    p = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 10 == 0)
    ).select("user_id", "event_id", "ts")
    c = load_table_fresh(spark, sf_dir, "events").filter(
        (F.col("event_type") == "click") & (F.col("user_id") % 10 == 0)
    ).select("user_id", "ts")

    def merge(pl: pd.DataFrame, cl: pd.DataFrame) -> pd.DataFrame:
        if pl.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "last_click_us": []}
            ).astype({"event_id": "int64", "user_id": "int64", "last_click_us": "int64"})
        cl = cl.sort_values("ts").assign(c_ts=lambda d: d["ts"])
        out = pd.merge_asof(
            pl.sort_values("ts"), cl, on="ts", by="user_id", direction="backward"
        )
        out = out.dropna(subset=["c_ts"])
        return pd.DataFrame(
            {
                "event_id": out["event_id"].astype("int64"),
                "user_id": out["user_id"].astype("int64"),
                "last_click_us": out["c_ts"].astype("int64") // 1000,
            }
        )

    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(
            merge, schema="event_id long, user_id long, last_click_us long"
        )
    )


@query(
    "udf_map_in_arrow",
    category="K.udf",
    oracle="""
WITH nrm AS (
  SELECT vec_id, embedding[1]::DOUBLE AS e0,
         sqrt(list_reduce(
                list_prepend(0.0, list_transform(embedding,
                                                 x -> x::DOUBLE * x::DOUBLE)),
                (s, x) -> s + x)) AS l2_norm
  FROM embeddings
)
SELECT vec_id, l2_norm, e0 / l2_norm AS head_norm FROM nrm
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy rung of the UDF cost ladder: the
    executor hands the Python worker raw Arrow RecordBatches (no pandas
    materialization, no per-column Series boxing), the natural interface
    for batch-native libs (tokenizers, ONNX, FAISS) over embedding
    columns. Computes each vector's L2 norm and its normalized first
    component. Equivalent built-in: F.aggregate over the array (the
    knn_* dot-product shape).

    Parity discipline: the float32 elements widen to float64 exactly in
    both engines; the squared sum is an explicit LEFT FOLD seeded at 0.0
    (Python accumulator loop ≡ DuckDB list_reduce(list_prepend(0.0,…)))
    because np.sum's pairwise tree would round differently; sqrt and the
    final division are single correctly-rounded IEEE ops. Exact oracle,
    unlike anything RNG- or thread-order-dependent.

    Scale: narrow map, no shuffle, pipelined per Arrow batch
    (spark.sql.execution.arrow.maxRecordsPerBatch rows of state at a
    time); the 64-element Python inner loop is the pedagogical pin — a
    production kernel would np.einsum per batch and accept last-ulp
    drift."""
    import math

    import pyarrow as pa

    e = Tables(spark, sf_dir).embeddings

    def normalize(batches):
        for batch in batches:
            vec_ids = batch.columns[0]
            norms, heads = [], []
            for emb in batch.columns[1].to_pylist():
                s = 0.0
                for v in emb:
                    s += v * v
                n = math.sqrt(s)
                norms.append(n)
                heads.append(emb[0] / n)
            yield pa.RecordBatch.from_arrays(
                [
                    vec_ids,
                    pa.array(norms, pa.float64()),
                    pa.array(heads, pa.float64()),
                ],
                names=["vec_id", "l2_norm", "head_norm"],
            )

    return e.select("vec_id", "embedding").mapInArrow(
        normalize, schema="vec_id bigint, l2_norm double, head_norm double"
    )


@query(
    "udf_arrow_scalar",
    category="K.udf",
    oracle="""
SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS n_unique
FROM documents
""",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED row UDF (``useArrow=True``) — the missing middle
    rung of the cost ladder: same per-row Python function signature as
    ``udf_python``, but batches cross the JVM↔Python boundary as Arrow
    instead of pickled rows (~2-5× on string-heavy inputs), without
    rewriting the fn to operate on pandas Series. Computes per-doc
    unique-token counts; equivalent built-in:
    ``F.size(F.array_distinct(F.split(...)))``. Pure integer output —
    exact oracle."""
    d = Tables(spark, sf_dir).documents

    @F.udf(returnType=LongType(), useArrow=True)
    def unique_tokens(text) -> int:
        # None in, None out (udf_python note)
        return None if text is None else len(set(text.split(" ")))

    return d.select("doc_id", unique_tokens("text").alias("n_unique"))


@query(
    "udf_pandas_iter",
    category="K.udf",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(text, ' '),
                       w -> regexp_full_match(w, '[a-z]+')))::BIGINT
         AS n_alpha_tokens
FROM documents
""",
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SCALAR_ITER`` pandas UDF — the amortized-initialization rung of
    the cost ladder: the iterator form runs per-worker setup ONCE (here
    a compiled regex; in production a tokenizer vocab, an ONNX session,
    a language-ID model) and then streams every Arrow batch through it,
    where the plain SCALAR form would re-enter Python state per batch
    boundary with no place to hang the setup. Counts lowercase-alpha
    tokens per doc; equivalent built-in:
    ``F.size(F.filter(F.split(...), rlike))``. Pure integer output —
    exact oracle (Python ``re.fullmatch`` ≡ RE2 ``regexp_full_match``
    on the char-class pattern).

    Scale: narrow map over Arrow batches, no shuffle; the once-per-task
    init is exactly what makes model-assisted curation (quality
    classifiers over 100 TB of text) affordable in this tier."""
    d = Tables(spark, sf_dir).documents

    @F.pandas_udf("long")
    def alpha_tokens(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import re

        pat = re.compile(r"[a-z]+")  # once per task, reused per batch
        for texts in it:
            yield texts.map(
                # None in, None out (udf_python note)
                lambda t: None
                if t is None
                else sum(1 for w in t.split(" ") if pat.fullmatch(w))
            )

    return d.select(
        "doc_id", alpha_tokens("text").alias("n_alpha_tokens")
    )
