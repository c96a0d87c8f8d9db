"""Multimodal binary-column pipeline: mapInPandas plumbing, stub gating,
and the deterministic featurizer (oracle-checked features are covered by
test_oracle_parity; this exercises the non-SQL parts)."""

from __future__ import annotations

import pytest

from mapreduce_server_spark.multimodal import binary
from mapreduce_server_spark.sources.loader import load_table

from .conftest import SF001


def test_media_frame_schema(spark):
    m = binary.media_frame(load_table(spark, SF001, "documents"))
    assert [f.name for f in m.schema.fields] == ["id", "media_type", "payload", "meta"]
    assert m.schema["payload"].dataType.simpleString() == "binary"
    assert m.schema["meta"].dataType.simpleString().startswith("struct<")


def test_extract_features_batchwise(spark):
    d = load_table(spark, SF001, "documents")
    feats = binary.extract_features(binary.media_frame(d)).collect()
    assert len(feats) == d.count()
    by_id = {r.id: r for r in feats}
    sample = d.select("doc_id", "text", "n_chars").head(5)
    import hashlib

    for row in sample:
        f = by_id[row.doc_id]
        assert f.byte_len == row.n_chars
        assert f.digest == hashlib.md5(row.text.encode()).hexdigest()
        assert f.first_byte == row.text.encode()[0]
        assert f.byte_sum_mod == sum(row.text.encode()) % 997


def test_decode_image_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        binary.decode_image(b"\x89PNG... not really")


def test_frame_sample_counts(spark):
    d = load_table(spark, SF001, "documents")
    m = binary.media_frame(d)
    frames = binary.frame_sample(m, every=5)
    rows = frames.collect()
    metas = {r.id: r.n_frames for r in m.select("id", "meta.n_frames").collect()}
    from collections import Counter

    per_id = Counter(r.id for r in rows)
    for vid, n_frames in metas.items():
        if vid % 3 == 2:
            assert per_id[vid] == (n_frames - 1) // 5 + 1
