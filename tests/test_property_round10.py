"""Property-based testing for the round-10 tier: hypothesis-generated
micro-corpora driven through the REAL operators (a synthetic
documents.parquet per example), checked against independent pure-Python
replays (the test_property_round9.py machinery).

Boundary classes these corpora hit that the committed fixture cannot:
- quality_decontaminate: sub-8-token documents (the clamped single
  window IS the doc), an empty eval slice (no doc_id % 10 == 7),
  all-identical corpora (every train doc contaminated), and duplicate
  docs straddling the train/eval split;
- quality_source_overlap: single-source corpora (no pairs by
  construction), duplicate texts across sources (guaranteed band
  collisions), and heavy bucket collisions from a 3-word vocabulary.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_server_spark.operators.dedup import (
    N_BANDS,
    N_HASHES,
    quality_source_overlap,
)
from mapreduce_server_spark.operators.quality import (
    DECON_N,
    quality_decontaminate,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

DOCS = st.lists(
    st.tuples(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=1,
    max_size=25,
)


def _write_documents(docs) -> str:
    d = tempfile.mkdtemp(prefix="prop_r10_")
    texts = [" ".join(toks) for toks, _src in docs]
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(docs)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(docs),
            "source": [src for _toks, src in docs],
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(d, "documents.parquet"))
    return d


def _ngrams(toks: list[str], n: int) -> set:
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - (n - 1), 1))}


@given(DOCS)
@SETTINGS
def test_decontaminate_property(spark, docs):
    sf_dir = _write_documents(docs)
    try:
        ev: set = set()
        for i, (toks, _src) in enumerate(docs):
            if i % 10 == 7:
                ev |= _ngrams(toks, DECON_N)
        expect = {}
        for i, (toks, src) in enumerate(docs):
            if i % 10 == 7:
                continue
            g = _ngrams(toks, DECON_N)
            hits = len(g & ev)
            if hits:
                expect[i] = (src, hits, len(g), round(hits / len(g), 6))
        got = {
            r["doc_id"]: (
                r["source"],
                r["n_hits"],
                r["n_ngrams"],
                r["hit_frac"],
            )
            for r in quality_decontaminate(spark, sf_dir).collect()
        }
        assert got == expect
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


def _mh(s: int, shingle: str) -> int:
    return int(hashlib.md5(f"mh{s}:{shingle}".encode()).hexdigest()[:8], 16)


@given(DOCS)
@SETTINGS
def test_source_overlap_property(spark, docs):
    sf_dir = _write_documents(docs)
    try:
        buckets: dict[str, set] = {}
        rpb = N_HASHES // N_BANDS
        for _i, (toks, src) in enumerate(docs):
            shingles = _ngrams(toks, 3)
            sig = [min(_mh(s, sh) for sh in shingles) for s in range(N_HASHES)]
            for b in range(N_BANDS):
                bucket = ",".join(str(v) for v in sig[b * rpb : (b + 1) * rpb])
                buckets.setdefault(src, set()).add((b, bucket))
        expect = {}
        srcs = sorted(buckets)
        for i, sa in enumerate(srcs):
            for sb in srcs[i + 1 :]:
                shared = len(buckets[sa] & buckets[sb])
                if shared:
                    na, nb = len(buckets[sa]), len(buckets[sb])
                    expect[(sa, sb)] = (
                        shared,
                        na,
                        nb,
                        round(shared / (na + nb - shared), 6),
                    )
        got = {
            (r["source_a"], r["source_b"]): (
                r["n_shared"],
                r["n_a"],
                r["n_b"],
                r["bucket_jaccard"],
            )
            for r in quality_source_overlap(spark, sf_dir).collect()
        }
        assert got == expect
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)
