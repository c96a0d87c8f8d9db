#!/usr/bin/env python
"""Build an sf1 fixture (10× sf0.1) for data-dominated scaling evidence.

Round-13 verdict #1: every SCALING exponent at sf0.1 is overhead-bound
(worst 0.54), so the "survives 100×" claim rested on plan-shape audits
alone. This tool materializes a corpus one decade bigger — 6M-row
lineitem, 1M events — at which data cost dominates fixed cost, without
inventing new data: each table is the UNION of 10 stamped copies of the
committed sf0.1 fixture with re-keyed ids, preserving every per-copy
distribution, correlation and planted property by construction.

Re-keying (copy i ∈ 0..9): every BIGINT entity/FK key gets
``key + i·10_000_000`` (all sf0.1 key spaces are ≪ 10M, so copies can
never collide and referential integrity is preserved copy-locally —
lineitem's l_orderkey offset matches orders' o_orderkey offset, etc.).
The dimension tables region/nation keep TPC-H semantics (fixed
cardinality) and are copied verbatim; FK columns into them
(c_nationkey, s_nationkey) are NOT re-keyed.

Documents get a per-copy tag appended to EVERY token (``word`` →
``wordc{i}``, n_chars recomputed): copies must be textually DISJOINT at
the shingle level, or every doc has 10 cross-copy near-duplicates, all
shingle buckets hold 10× members, and the dedup pair tier goes
quadratic by CONSTRUCTION, not by data growth — distorting exactly the
exponents this corpus exists to measure (a first cut tagged only a
prefix token; the unchanged interior shingles still collided and the
DuckDB oracle ground for >30 min on the 100× candidate set). The
per-copy token spaces keep within-copy structure isomorphic to sf0.1,
so dedup/tfidf/wordcount results are exactly 10 stamped copies of the
sf0.1 results.

Embeddings are the one table the PARITY corpus does NOT scale: the
similarity tier's DuckDB oracles are inherently all-pairs in ANSI SQL
(``a JOIN b ON a.vec_id < b.vec_id`` + per-pair 64-dim list folds —
there is no SQL-expressible sublinear replay), so ×10 vectors make the
ORACLE evaluate 200M interpreted pairs (>30 min on ONE key, measured)
while the Spark side stays BLAS-blocked and fast — the sf1 gate would
be timing DuckDB's nested-loop join, not this engine. sf1 therefore
keeps embeddings verbatim (2k rows), and a sibling corpus ``sf1emb``
(embeddings ×10 = 20k with re-keyed vec_ids; every other table a copy
of sf1's) exists for SPARK-SIDE scaling measurement of the knn
watch-list in tools/scaling_report.py, where no oracle runs.

Writes to .localdata/sf1 and .localdata/sf1emb (gitignored — ~360 MB
of derived parquet is not repo content; rebuild is one command,
~60 s). Not under .scratch: the TTL GC would reap it between sessions.

Usage: python tools/build_sf1.py [dest_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DEFAULT_DEST = os.path.join(REPO, ".localdata", "sf1")

#: copy-offset applied to every entity/FK BIGINT key (≫ any sf0.1 key).
OFFSET = 10_000_000

#: per-table key columns to shift by i·OFFSET (dimension FKs excluded).
REKEY = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def build(dest: str = DEFAULT_DEST, copies: int = 10, src: str = SRC) -> str:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t, keys in REKEY.items():
        path = os.path.join(src, f"{t}.parquet")
        if not keys or t == "embeddings":
            # dimensions: fixed cardinality; embeddings: oracle-
            # tractability (module docstring) — scaled copy in sf1emb
            q = f"SELECT * FROM read_parquet('{path}')"
        else:
            repl = [f"({k} + i * {OFFSET}) AS {k}" for k in keys]
            if t == "documents":
                # per-copy token spaces keep copies shingle-disjoint
                # (see module docstring); NULL text propagates NULL
                tagged = (
                    "regexp_replace(text, '([a-z0-9]+)', "
                    "'\\1c' || i::VARCHAR, 'g')"
                )
                repl += [
                    f"{tagged} AS text",
                    f"length({tagged})::BIGINT AS n_chars",
                ]
            # EXCLUDE (i): without it, SELECT * carries the range()
            # copy index into the output parquet as a real column —
            # the round-13 sweep caught it as a sketch_countmin binder
            # error ("ambiguous column i") plus three value mismatches
            # on queries whose Spark side enumerates table columns.
            q = (
                f"SELECT * EXCLUDE (i) REPLACE ({', '.join(repl)}) "
                f"FROM read_parquet('{path}'), range({copies}) AS r(i)"
            )
        out = os.path.join(dest, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)

    # sibling SPARK-SIDE-only corpus: embeddings ×copies, rest = sf1
    emb_dest = dest.rstrip("/") + "emb"
    os.makedirs(emb_dest, exist_ok=True)
    for t in REKEY:
        if t == "embeddings":
            continue
        link = os.path.join(emb_dest, f"{t}.parquet")
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(os.path.join(dest, f"{t}.parquet"), link)
    q = (
        f"SELECT * EXCLUDE (i) REPLACE ((vec_id + i * {OFFSET}) AS vec_id) "
        f"FROM read_parquet('{os.path.join(src, 'embeddings.parquet')}'), "
        f"range({copies}) AS r(i)"
    )
    out = os.path.join(emb_dest, "embeddings.parquet")
    con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"sf1emb embeddings: {n} rows", flush=True)
    con.close()
    return dest


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DEST)
