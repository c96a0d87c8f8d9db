"""Round-8 operator semantics: independent pure-Python replays (parity
alone does not prove the formula — ARCHITECTURE §17's ts_cross_corr
lesson), built from the raw parquet fixture, never from either engine's
pipeline."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def _d6(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def test_sample_temperature_replays_policy_and_realization(spark):
    """Full replay of the T=2 temperature resampler: tempered weights,
    lang-sorted sequential normalizer fold, half-up integer targets,
    repeat/threshold split, and the md5 fractional keep — each output
    column must match the operator exactly, and the tempered mixture
    must actually flatten the skew (en share strictly down, every rare
    language strictly up vs its raw share)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, doc_id FROM '{SF001}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, list[int]] = {}
    for lang, doc_id in rows:
        by_lang.setdefault(lang, []).append(doc_id)
    n_corpus = len(rows)

    # policy math — explicit sequential fold in lang-sorted order
    w = {
        lang: math.sqrt(len(ids) / n_corpus) for lang, ids in by_lang.items()
    }
    wsum = 0.0
    for lang in sorted(w):
        wsum += w[lang]
    expect = {}
    for lang, ids in by_lang.items():
        p = w[lang] / wsum
        target = math.floor(n_corpus * p + 0.5)
        n_total = len(ids)
        n_repeat = target // n_total
        th = math.floor(65536.0 * (target % n_total) / n_total)
        kept_extra = sum(
            1
            for d in ids
            if int(
                hashlib.md5(f"tmp:{d}".encode()).hexdigest()[:4], 16
            )
            < th
        )
        expect[lang] = dict(
            n_total=n_total,
            mix_share=_d6(p),
            target_n=target,
            n_repeat=n_repeat,
            kept_extra=kept_extra,
            realized_n=n_repeat * n_total + kept_extra,
        )

    got = REGISTRY["sample_temperature"].fn(spark, SF001).collect()
    assert {r.lang for r in got} == set(expect)
    for r in got:
        e = expect[r.lang]
        assert r.n_total == e["n_total"]
        assert Decimal(repr(r.mix_share)) == e["mix_share"], r.lang
        assert r.target_n == e["target_n"]
        assert r.n_repeat == e["n_repeat"]
        assert r.kept_extra == e["kept_extra"]
        assert r.realized_n == e["realized_n"]

    # targets partition ~the corpus (±1 half-up rounding per language)
    assert abs(sum(e["target_n"] for e in expect.values()) - n_corpus) <= len(
        expect
    )
    # T=2 flattens: dominant language down, every other language up
    raw = {lang: len(ids) / n_corpus for lang, ids in by_lang.items()}
    dom = max(raw, key=raw.get)
    for r in got:
        if r.lang == dom:
            assert float(r.mix_share) < raw[r.lang]
        else:
            assert float(r.mix_share) > raw[r.lang]


def test_knn_semdedup_replays_drop_semantics(spark):
    """Third-opinion replay of SemDeDup from the raw parquet: micro-
    quantized int64 cell assignment (explicit (dist, cid) argmin),
    sequential-fold cosines (math.sqrt, per-element loops — never numpy
    accumulators, which fold in a different order), the ≥T pair rule
    over ALL within-cell pairs (no BLAS prefilter — it must only ever
    PRUNE), and the drop-the-(csim, vec_id)-larger survivor rule. The
    per-cell accounting must match the operator exactly. Shares only
    the trained centroid list with the operator (itself pinned by
    test_knn_ivf_deterministic_rebuild); everything downstream is
    re-derived independently."""
    from mapreduce_server_spark.operators.similarity import (
        SEMDEDUP_T,
        _ivf_centroids,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF001}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    cents = _ivf_centroids(spark, SF001)
    cvd = [[v / 1000000 for v in c] for c in cents]

    def micro(vec):
        return [math.floor(float(x) * 1000000.0 + 0.5) for x in vec]

    def sdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    cells: dict[int, list[tuple[int, list[float]]]] = {}
    csim: dict[int, float] = {}
    nrm: dict[int, float] = {}
    for vec_id, emb in rows:
        vi = micro(emb)
        best = min(
            (
                (
                    sum((a - b) * (a - b) for a, b in zip(vi, c)),
                    cid,
                )
                for cid, c in enumerate(cents)
            )
        )
        cl = best[1]
        cells.setdefault(cl, []).append((vec_id, emb))
        nrm[vec_id] = math.sqrt(sdot(emb, emb))
        cv = cvd[cl]
        csim[vec_id] = sdot(emb, cv) / (
            nrm[vec_id] * math.sqrt(sdot(cv, cv))
        )

    dropped: set[int] = set()
    for cl, members in cells.items():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ia, ea = members[i]
                ib, eb = members[j]
                if sdot(ea, eb) / (nrm[ia] * nrm[ib]) >= SEMDEDUP_T:
                    if (csim[ia], ia) > (csim[ib], ib):
                        dropped.add(ia)
                    else:
                        dropped.add(ib)

    expect = {
        cl: (
            len(members),
            sum(1 for v, _e in members if v in dropped),
        )
        for cl, members in cells.items()
    }
    got = REGISTRY["knn_semdedup"].fn(spark, SF001).collect()
    assert {r.cluster: (r.n_vectors, r.n_dropped) for r in got} == expect
    for r in got:
        want = _d6(expect[r.cluster][1] / expect[r.cluster][0])
        assert Decimal(repr(r.drop_ratio)) == want
