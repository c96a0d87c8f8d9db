"""Multimodal (binary) columns: opaque payloads + typed metadata
(north star: image/audio/video as first-class pipeline data).

Model: media rows are ``(id, media_type, payload: binary, meta: struct)``.
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schema, partition preservation, batch shape) is real
and oracle/pytest-tested; the codec itself is pluggable:

- real decoders (PIL / soundfile / av) are absent in this environment, so
  ``decode_image`` raises ``NotImplementedError`` unless a library import
  succeeds (clearly-marked stub per the task contract);
- ``extract_features`` uses a deterministic byte-level fake featurizer
  (length, digest, byte-histogram stats) so the distributed pipeline is
  fully exercised and hash-stable.

Scale notes: payloads never pass through Python row-at-a-time — Arrow
moves whole column batches; feature extraction is embarrassingly parallel
(no shuffle); downstream joins treat media ids like any other key.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id BIGINT, media_type STRING, byte_len BIGINT, digest STRING, "
    "first_byte INT, byte_sum_mod BIGINT"
)


def media_frame(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: payload = UTF-8 bytes of
    the text (a deterministic opaque blob), typed metadata alongside."""
    return documents.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_bytes"),
            (F.col("doc_id") % 25 + 1).cast("int").alias("n_frames"),
            F.lit("synthetic/v1").alias("format"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image decode requires an imaging library not present in
    this environment. The mapInPandas plumbing around it is real; swap
    this body for PIL/pyarrow-image when available."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding needs PIL; environment provides none — "
            "use extract_features() (deterministic byte featurizer) instead"
        ) from exc


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic byte-level features stand in for codec output: length,
    MD5 digest, first byte, byte-sum mod 997. mapInPandas processes whole
    Arrow batches — the 100 TB shape for Python-side media work.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # A NULL payload (missing media) features as all-NULL — the
        # SQL null-propagation a JVM-side expression would give; a
        # Python UDF sees None and must spell the guard itself
        # (round-11 NULL-text axis). Distinct from the EMPTY payload,
        # whose sentinel is first_byte = -1.
        def m(s: pd.Series, fn):
            return s.map(lambda b: None if b is None else fn(b))

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "byte_len": m(payloads, len),
                    "digest": m(
                        payloads, lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "first_byte": m(
                        payloads, lambda b: b[0] if len(b) else -1
                    ),
                    "byte_sum_mod": m(
                        payloads, lambda b: sum(bytes(b)) % 997
                    ),
                }
            )

    return media.select("id", "media_type", "payload").mapInPandas(
        featurize, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every: int = 5) -> DataFrame:
    """Frame sampling for "video" media: emit one row per sampled frame
    index (0, every, 2·every, … < n_frames) — pure JVM-side explode; the
    per-frame decode would slot into extract_features downstream."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.n_frames") - 1, F.lit(every)
                )
            ).alias("frame_idx"),
        )
    )
