"""Property-based testing for the round-8 tier: hypothesis-generated
micro-corpora driven through the REAL pack_ffd and sample_temperature
operators (a synthetic ``documents.parquet`` per example), checked
against independent pure-Python replays.

Why this layer (same rationale as test_property_dedup): the fixture
parity gate proves each operator on ONE corpus; the boundaries random
corpora probe here are exactly the ones a fixed fixture can't —
  * pack_ffd: first-fit ties (several bins with identical remaining
    capacity), items that exactly fill a bin (rem == nt), and the
    new-bin branch firing mid-stream;
  * sample_temperature: a SINGLE language (weight normalizes to 1.0,
    zero fractional keep), heavy upsampling (1-doc languages ⇒
    n_repeat > 1), and targets straddling the floor(x+0.5) boundary.

Replays follow the house float discipline: explicit sequential folds
in sorted order, math.sqrt (never **0.5), Decimal HALF_UP for the one
rounded output (the round-7 half-even trap)."""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import tempfile
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_server_spark.operators.pipeline import _FFD_CAP, pack_ffd
from mapreduce_server_spark.operators.curation import sample_temperature

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: (n_tokens, source_idx, lang_idx) per document; token counts hug the
#: 128 cap's divisors/boundaries so exact fills and first-fit ties occur.
DOCS = st.lists(
    st.tuples(
        st.sampled_from([1, 2, 3, 16, 32, 64, 96, 127, 128]),
        st.integers(0, 2),
        st.integers(0, 3),
    ),
    min_size=1,
    max_size=24,
)

LANGS = ["en", "de", "fr", "zh"]


def _write_fixture(spec) -> str:
    d = tempfile.mkdtemp(prefix="prop_r8_")
    texts = [" ".join(["tok"] * nt) for nt, _s, _l in spec]
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(spec)), dtype="int64"),
            "text": texts,
            "lang": [LANGS[li] for _nt, _s, li in spec],
            "source": [f"src{si}" for _nt, si, _l in spec],
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf), os.path.join(d, "documents.parquet")
    )
    return d


def _ffd_replay(spec) -> set[tuple[str, int, int, int, int]]:
    by_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, (nt, si, _l) in enumerate(spec):
        by_src.setdefault(f"src{si}", []).append((nt, doc_id))
    out = set()
    for src, items in by_src.items():
        items.sort(key=lambda x: (-x[0], x[1]))
        remaining: list[int] = []
        stats: list[list[int]] = []
        for nt, _doc in items:
            placed = next(
                (i for i, rem in enumerate(remaining) if nt <= rem), -1
            )
            if placed < 0:
                remaining.append(_FFD_CAP)
                stats.append([0, 0, 0])
                placed = len(remaining) - 1
            remaining[placed] -= nt
            s = stats[placed]
            s[0] += 1
            s[1] += nt
            s[2] = max(s[2], nt)
        out |= {(src, b, s[0], s[1], s[2]) for b, s in enumerate(stats)}
    return out


@SETTINGS
@given(DOCS)
def test_pack_ffd_matches_pure_python_ffd(spark, spec):
    d = _write_fixture(spec)
    try:
        got = {
            (r.source, r.bin_id, r.n_docs, r.total_tokens, r.max_doc_tokens)
            for r in pack_ffd(spark, d).collect()
        }
        assert got == _ffd_replay(spec)
        # capacity invariant: a bin only exceeds the cap when a single
        # oversize document owns it (none generated here, so strict)
        for _src, _b, _nd, total, _mx in got:
            assert total <= _FFD_CAP
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _temperature_replay(spec):
    by_lang: dict[str, list[int]] = {}
    for doc_id, (_nt, _s, li) in enumerate(spec):
        by_lang.setdefault(LANGS[li], []).append(doc_id)
    n_corpus = len(spec)
    w = {
        lang: math.sqrt(len(ids) / n_corpus) for lang, ids in by_lang.items()
    }
    wsum = 0.0
    for lang in sorted(w):
        wsum += w[lang]
    out = {}
    for lang, ids in by_lang.items():
        p = w[lang] / wsum
        target = math.floor(n_corpus * p + 0.5)
        n_total = len(ids)
        n_repeat = target // n_total
        th = math.floor(65536.0 * (target % n_total) / n_total)
        kept = sum(
            1
            for doc in ids
            if int(hashlib.md5(f"tmp:{doc}".encode()).hexdigest()[:4], 16) < th
        )
        out[lang] = (
            n_total,
            Decimal(repr(p)).quantize(Decimal("0.000001"), ROUND_HALF_UP),
            target,
            n_repeat,
            kept,
            n_repeat * n_total + kept,
        )
    return out


@SETTINGS
@given(DOCS)
def test_sample_temperature_matches_policy_replay(spark, spec):
    d = _write_fixture(spec)
    try:
        expect = _temperature_replay(spec)
        rows = sample_temperature(spark, d).collect()
        assert {r.lang for r in rows} == set(expect)
        for r in rows:
            n_total, share, target, n_repeat, kept, realized = expect[r.lang]
            assert r.n_total == n_total
            assert Decimal(repr(r.mix_share)) == share, r.lang
            assert r.target_n == target
            assert r.n_repeat == n_repeat
            assert r.kept_extra == kept
            assert r.realized_n == realized
        if len(expect) == 1:
            # single language: tempered mixture is the whole corpus and
            # the fractional keep never fires (target == n ⇒ th == 0)
            (r,) = rows
            assert r.target_n == r.n_total == r.realized_n
            assert r.n_repeat == 1 and r.kept_extra == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
