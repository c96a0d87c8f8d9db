"""Registered queries over the multimodal binary-column pipeline
(:mod:`..multimodal.binary`). The featurizer is deterministic, so the
byte-level features are SQL-expressible and oracle-checked: the corpus is
ASCII, hence byte_len == length(text) and the MD5 digests agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.binary import extract_features, frame_sample, media_frame
from ..registry import query
from ..sources.loader import Tables


@query(
    "multimodal_features",
    category="J.multimodal",
    oracle="""
SELECT doc_id AS id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS digest,
       CASE WHEN length(text) = 0 THEN -1
            ELSE ('0x' || substr(hex(encode(text)), 1, 2))::INT
       END AS first_byte
FROM documents
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload featurization via Arrow-batched mapInPandas; the
    oracle recomputes the features from the source text. The contract
    is BYTE-level (the featurizer sees an opaque UTF-8 payload), so the
    oracle spells bytes explicitly: octet_length(encode(text)) — NOT
    length(text), which counts codepoints and diverges on any
    non-ASCII corpus (round-10 unicode sweep) — and first_byte is the
    first UTF-8 byte via hex(encode(text)) (é features as 0xC3, not
    codepoint 233). An EMPTY payload features as first_byte = -1 — the
    featurizer's documented sentinel, mirrored in the oracle's CASE
    (round-10 blank-text sweep)."""
    d = Tables(spark, sf_dir).documents
    feats = extract_features(media_frame(d))
    return feats.select(
        "id",
        "media_type",
        "byte_len",
        "digest",
        F.col("first_byte").cast("int").alias("first_byte"),
    )


@query(
    "multimodal_frame_sample",
    category="J.multimodal",
    oracle="""
SELECT doc_id AS id, g.f AS frame_idx
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, (doc_id % 25)::INT, 5)) AS f) g
WHERE doc_id % 3 = 2
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one row per sampled frame index (stride 5),
    frame count from typed metadata — JVM-side sequence+explode."""
    d = Tables(spark, sf_dir).documents
    return frame_sample(media_frame(d)).select(
        "id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


@query(
    "multimodal_dedup",
    category="J.multimodal",
    oracle="""
WITH f AS (SELECT doc_id AS id, md5(text) AS digest,
                  octet_length(encode(text)) AS byte_len
           FROM documents)
SELECT digest, count(*) AS n_copies, min(id) AS survivor_id,
       min(byte_len) AS byte_len
FROM f GROUP BY 1 HAVING count(*) >= 2
""",
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over OPAQUE BINARY payloads: digest each blob inside
    the Arrow-batched featurizer (the only place the bytes are touched),
    then dedup is an ordinary hash-groupBy over the digest column —
    byte-identical images/audio collapse without the engine ever
    interpreting them, the deterministic-survivor (min id) rule of
    dedup_exact applied to media. At 100 TB this is THE first pass of
    any multimodal curation pipeline: digests are 32 bytes regardless
    of payload size, so the shuffle moves hashes, never media."""
    d = Tables(spark, sf_dir).documents
    feats = extract_features(media_frame(d))
    return (
        feats.groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("id").alias("survivor_id"),
            F.min("byte_len").alias("byte_len"),
        )
        .where(F.col("n_copies") >= 2)
    )
