"""End-to-end training-data curation pipeline (north star showcase).

One composed plan — quality gate → exact dedup → multimodal join →
curated stats — exactly the shape of an LLM-data pipeline run: each stage
is an operator this engine already verifies in isolation; the composition
proves they chain into a single Catalyst-optimized query (no
materialization between stages, predicate/prune effects flow through).

Scale: the pipeline is one scan of documents + one window (dedup) + one
equi-join (embeddings) + one aggregation — the same shuffle count as its
most expensive stage, NOT the sum of stages; that is the point of
composing plans instead of materializing intermediate datasets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import Tables


@query(
    "pipeline_curation",
    category="J.pipeline",
    tags=("showcase",),
    oracle="""
WITH quality AS (
  SELECT doc_id, lang, source, text,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) BETWEEN 10 AND 90
),
deduped AS (
  SELECT doc_id, lang, source, n_tokens
  FROM (SELECT doc_id, lang, source, n_tokens,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM quality)
  WHERE rn = 1
),
joined AS (
  SELECT d.lang, d.n_tokens, e.label
  FROM deduped d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT lang, label,
       count(*) AS n_docs,
       sum(n_tokens) AS total_tokens,
       sum(n_tokens)::DOUBLE / count(*) AS avg_tokens
FROM joined
GROUP BY lang, label
""",
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → token-length quality gate → deterministic exact dedup →
    embedding join → per-(lang, label) curated corpus stats."""
    t = Tables(spark, sf_dir)
    toks = F.size(F.split("text", " "))
    quality = t.documents.withColumn("n_tokens", toks.cast("long")).filter(
        F.col("n_tokens").between(10, 90)
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_tokens")
    )
    joined = deduped.join(
        t.embeddings.select("vec_id", "label"), F.col("doc_id") == F.col("vec_id")
    )
    return joined.groupBy("lang", "label").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens") / F.count(F.lit(1))).alias("avg_tokens"),
    )
