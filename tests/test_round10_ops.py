"""Round-10 operator evidence beyond oracle parity: a full pure-Python
replay of quality_source_overlap from the raw parquet (the round-9
test_round9_ops.py pattern — re-derive the whole pipeline with none of
the operator's code, compare exactly)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from mapreduce_server_spark import REGISTRY

from .conftest import SF0001

N_HASHES, N_BANDS = 16, 4


def _mh(s: int, shingle: str) -> int:
    return int(hashlib.md5(f"mh{s}:{shingle}".encode()).hexdigest()[:8], 16)


def _replay(sf_dir: str) -> dict[tuple[str, str], tuple[int, int, int, float]]:
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    src_buckets: dict[str, set] = defaultdict(set)
    for _doc_id, source, text in rows:
        toks = text.split(" ")
        shingles = {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}
        sig = [min(_mh(s, sh) for sh in shingles) for s in range(N_HASHES)]
        rpb = N_HASHES // N_BANDS
        for b in range(N_BANDS):
            bucket = ",".join(str(v) for v in sig[b * rpb : (b + 1) * rpb])
            src_buckets[source].add((b, bucket))
    out = {}
    sources = sorted(src_buckets)
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            shared = len(src_buckets[sa] & src_buckets[sb])
            if shared:
                na, nb = len(src_buckets[sa]), len(src_buckets[sb])
                out[(sa, sb)] = (
                    shared,
                    na,
                    nb,
                    round(shared / (na + nb - shared), 6),
                )
    return out


def test_source_overlap_matches_pure_python_replay(spark):
    expect = _replay(SF0001)
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_shared"],
            r["n_a"],
            r["n_b"],
            r["bucket_jaccard"],
        )
        for r in REGISTRY["quality_source_overlap"]
        .raw_fn(spark, SF0001)
        .collect()
    }
    assert got == expect
    assert len(got) >= 1  # the fixture has real cross-source collisions


def _decon_replay(sf_dir: str) -> dict[int, tuple[str, int, int, float]]:
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    N = 8
    grams: dict[int, tuple[str, set]] = {}
    for doc_id, source, text in rows:
        t = text.split(" ")
        g = {
            " ".join(t[i : i + N])
            for i in range(max(len(t) - (N - 1), 1))
        }
        grams[doc_id] = (source, g)
    ev: set = set()
    for doc_id, (_s, g) in grams.items():
        if doc_id % 10 == 7:
            ev |= g
    out = {}
    for doc_id, (source, g) in grams.items():
        if doc_id % 10 == 7:
            continue
        hits = len(g & ev)
        if hits:
            out[doc_id] = (source, hits, len(g), round(hits / len(g), 6))
    return out


def test_decontaminate_matches_pure_python_replay(spark):
    expect = _decon_replay(SF0001)
    got = {
        r["doc_id"]: (r["source"], r["n_hits"], r["n_ngrams"], r["hit_frac"])
        for r in REGISTRY["quality_decontaminate"].raw_fn(spark, SF0001).collect()
    }
    assert got == expect
    assert len(got) >= 1  # the fixture's planted dups straddle the split


def test_spark_levenshtein_is_character_level(spark):
    """Pin the engine's edit-distance unit: CODEPOINTS, not bytes (the
    byte-based spelling is DuckDB's builtin — see dedup_levenshtein's
    docstring). An astral-plane emoji (a UTF-16 surrogate pair, 4 UTF-8
    bytes) must still count as ONE edit."""
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        F.levenshtein(F.lit("café x"), F.lit("cafe x")).alias("accent"),
        F.levenshtein(F.lit("🚀a"), F.lit("a")).alias("emoji"),
        F.levenshtein(F.lit("数据"), F.lit("数报")).alias("cjk"),
    ).collect()[0]
    assert (row["accent"], row["emoji"], row["cjk"]) == (1, 1, 1)


def test_source_overlap_is_sparse_and_symmetric_free(spark):
    """Only source_a < source_b rows (no diagonal, no mirrored pairs),
    and every Jaccard is in (0, 1]."""
    rows = (
        REGISTRY["quality_source_overlap"].raw_fn(spark, SF0001).collect()
    )
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["bucket_jaccard"] <= 1
        assert r["n_shared"] <= min(r["n_a"], r["n_b"])
