"""Empty (0-row) and single-row fixture sweeps: EVERY oracle key must
stay Spark≡DuckDB when tables are emptied or reduced to one row.

Fourth and fifth axes of the degenerate-input gate (after the 12-hour /
truncated-rows sweeps in test_shrunken_fixture.py and the
constant-column sweep in test_flat_fixture.py): truncations shrink
GROUPS and flattening zeroes VARIANCES, but only 0-row/1-row tables
exercise empty-input folds (``list_sum`` on empty lists vs ``fsum`` on
empty arrays), global aggregates over zero rows (both engines emit one
all-NULL row — but only if the Spark side doesn't crash first), window
ops over single rows, driver-side bounded collects that assume a seed
row exists (k-center's Gonzalez argmax, IVF quantizer training), and
``head``-style admission logic. At 100 TB these are not edge cases:
a predicate or a partition filter can empty ANY intermediate frame.

A third axis rides along: BLANK document text (every row kept, text =
''), the degenerate tokenization input — ``string_split('')`` yields
[''], shingle/n-gram windows clamp to a single empty window, and
byte-level featurizers see zero-length payloads (found the
multimodal_features first_byte sentinel divergence: the featurizer's
documented -1 vs DuckDB's bare ascii('') = 0).

And a fourth: NON-ASCII text (accents, CJK, an astral-plane emoji
prefixed deterministically per doc) — the normal case at 100 TB, and
the byte-vs-codepoint fault line. It found the multimodal byte
features spelled char-level in their oracles (length(text) vs
octet_length(encode(text)); ascii() vs the first UTF-8 byte), and one
genuine ENGINE-BUILTIN difference: DuckDB's levenshtein() is
BYTE-based while Spark's is CHARACTER-based (levenshtein('café x',
'cafe x') = 2 vs 1). The engine's semantics are Spark's char-level
(the right metric for text); dedup_levenshtein is therefore excluded
from exact parity on THIS fixture only and pinned by the provable
relationship instead (char dist ≤ byte dist ⇒ duck's result set ⊆
spark's, equal dists on ASCII pairs — see
test_unicode_levenshtein_relationship).

Fixture construction (pure projections of the committed sf0.001
fixture — deterministic, no synthesis, schema preserved exactly by
``WHERE false`` / keyed ``ORDER BY … LIMIT 1`` / REPLACE-projection):
  * empty:      every table ``WHERE false``           (0 rows, same schema)
  * single-row: every table ``ORDER BY <pk> LIMIT 1`` (lowest-key row)
  * blank-text: documents text = '' / n_chars = 0, other tables verbatim
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest

from mapreduce_server_spark import REGISTRY
from mapreduce_server_spark.sources.loader import TABLE_NAMES

from .conftest import SF0001, make_duck
from .parity import assert_parity

# Deterministic per-table primary key for the single-row selection.
_PK = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey, l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def build_fixture(dest: str, mode: str, src_dir: str = SF0001) -> None:
    """Materialize the degenerate fixture into ``dest``.
    mode ∈ {empty, one, blank}."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if mode == "empty":
            q = f"SELECT * FROM read_parquet('{src}') WHERE false"
        elif mode == "one":
            q = f"SELECT * FROM read_parquet('{src}') ORDER BY {_PK[t]} LIMIT 1"
        elif mode == "blank":
            if t == "documents":
                q = (
                    "SELECT doc_id, '' AS text, lang, source, "
                    f"0::BIGINT AS n_chars FROM read_parquet('{src}')"
                )
            else:
                q = f"SELECT * FROM read_parquet('{src}')"
        elif mode == "x10":
            x10 = {
                "lineitem": "(l_quantity * 10.0)::DOUBLE AS l_quantity, "
                            "(l_extendedprice * 10.0)::DOUBLE AS l_extendedprice",
                "events": "(value * 10.0)::DOUBLE AS value",
                "customer": "(c_acctbal * 10.0)::DOUBLE AS c_acctbal",
                "orders": "(o_totalprice * 10.0)::DOUBLE AS o_totalprice",
                "part": "(p_retailprice * 10.0)::DOUBLE AS p_retailprice",
            }
            if t in x10:
                q = f"SELECT * REPLACE ({x10[t]}) FROM read_parquet('{src}')"
            else:
                q = f"SELECT * FROM read_parquet('{src}')"
        elif mode == "unicode":
            if t == "documents":
                q = (
                    "SELECT doc_id, CASE doc_id % 3 WHEN 0 THEN 'café ' "
                    "WHEN 1 THEN '数据处理 ' ELSE '🚀préfix ' END || text "
                    "AS text, lang, source, "
                    "length(CASE doc_id % 3 WHEN 0 THEN 'café ' "
                    "WHEN 1 THEN '数据处理 ' ELSE '🚀préfix ' END || text)"
                    f"::BIGINT AS n_chars FROM read_parquet('{src}')"
                )
            else:
                q = f"SELECT * FROM read_parquet('{src}')"
        else:  # pragma: no cover
            raise ValueError(mode)
        con.execute(
            f"COPY ({q}) TO '{os.path.join(dest, t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()


def _sweep(
    spark, fix_dir: str, exclude: frozenset[str] = frozenset()
) -> list[tuple[str, str]]:
    duck = make_duck(fix_dir)
    keys = sorted(
        k for k, s in REGISTRY.items() if s.oracle and k not in exclude
    )
    assert len(keys) >= 300  # the sweep must cover the whole registry
    bad: list[tuple[str, str]] = []
    for k in keys:
        try:
            assert_parity(
                REGISTRY[k].raw_fn(spark, fix_dir),
                duck,
                REGISTRY[k].oracle,
                k,
            )
        except AssertionError as e:
            bad.append((k, f"MISMATCH {str(e)[:160]}"))
        except Exception as e:  # engine error = worst divergence class
            bad.append((k, f"{type(e).__name__} {str(e)[:160]}"))
    return bad


@pytest.fixture(scope="module")
def empty_dir():
    d = tempfile.mkdtemp(prefix="emptyfix_")
    build_fixture(d, "empty")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def one_dir():
    d = tempfile.mkdtemp(prefix="onefix_")
    build_fixture(d, "one")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_every_oracle_survives_empty_tables(spark, empty_dir):
    bad = _sweep(spark, empty_dir)
    assert not bad, bad


def test_every_oracle_survives_single_row_tables(spark, one_dir):
    bad = _sweep(spark, one_dir)
    assert not bad, bad


@pytest.fixture(scope="module")
def blank_dir():
    d = tempfile.mkdtemp(prefix="blankfix_")
    build_fixture(d, "blank")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_every_oracle_survives_blank_text(spark, blank_dir):
    bad = _sweep(spark, blank_dir)
    assert not bad, bad


@pytest.fixture(scope="module")
def unicode_dir():
    d = tempfile.mkdtemp(prefix="unifix_")
    build_fixture(d, "unicode")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_every_oracle_survives_non_ascii_text(spark, unicode_dir):
    # dedup_levenshtein excluded: DuckDB's levenshtein builtin is
    # byte-based, Spark's char-based — a genuine engine-builtin
    # difference pinned by the relationship test below instead.
    bad = _sweep(spark, unicode_dir, exclude=frozenset({"dedup_levenshtein"}))
    assert not bad, bad


@pytest.fixture(scope="module")
def x10_dir():
    d = tempfile.mkdtemp(prefix="x10fix_")
    build_fixture(d, "x10")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_every_oracle_survives_10x_magnitudes(spark, x10_dir):
    """Value-domain envelope margin: every monetary/measure column at
    10× the fixture's magnitudes (prices to ~1e6). Magnitude is a DATA
    DOMAIN property, not a scale property — 100 TB grows row counts
    (absorbed by the DECIMAL(38) sum discipline and the documented
    doubles-combine rules), not individual prices — but a full
    order-of-magnitude margin over the domain must hold cleanly.
    Measured saturation edges beyond this margin (the ×1e5 probe,
    round 10): agg_corr / ts_autocorr / ts_sax / q9_product_profit
    overflow DuckDB-side DECIMAL(18) product casts and stat_levene's
    Spark-side DECIMAL(13,6) residual between ×10 and ×1e5 — widen
    those casts first if the domain contract ever grows."""
    bad = _sweep(spark, x10_dir)
    assert not bad, bad


def test_rows_only_keys_survive_degenerate_inputs(spark, empty_dir, one_dir):
    """The 4 rows-only keys have no oracle, so the parity sweeps skip
    them — execute them directly: they must build and run (not crash)
    on 0-row and 1-row fixtures."""
    keys = sorted(k for k, s in REGISTRY.items() if not s.oracle)
    assert len(keys) == 4, keys
    for k in keys:
        for d in (empty_dir, one_dir):
            REGISTRY[k].raw_fn(spark, d).collect()


def test_unicode_levenshtein_relationship(spark, unicode_dir):
    """Char-level edit distance never exceeds byte-level (every char
    edit costs >= 1 byte edit), and both engines share the char-counted
    length cutoff — so DuckDB's byte-based result set is a SUBSET of
    Spark's on non-ASCII text, with spark_dist <= duck_dist on shared
    pairs and equality wherever both texts are pure ASCII."""
    duck = make_duck(unicode_dir)
    srows = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in REGISTRY["dedup_levenshtein"].raw_fn(spark, unicode_dir).collect()
    }
    drows = {
        (a, b): dist
        for a, b, dist in duck.execute(
            REGISTRY["dedup_levenshtein"].oracle
        ).fetchall()
    }
    assert set(drows) <= set(srows), (set(drows) - set(srows))
    for pair, ddist in drows.items():
        assert srows[pair] <= ddist, (pair, srows[pair], ddist)
