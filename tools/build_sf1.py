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

Documents get a per-copy text tag (``c{i} `` prefix, n_chars adjusted):
without it every doc would have 10 cross-copy EXACT duplicates, turning
the corpus duplicate-heavy — shingle buckets would hold 10× members and
the dedup pair tier would go quadratic by CONSTRUCTION, not by data
growth, distorting exactly the exponents this corpus exists to measure
(the dup-heavy regime has its own committed axis). Embedding vectors
are copied verbatim (duplicate vectors are legal corpus content and
knn output stays well-defined through vec_id tiebreaks).

Writes to .localdata/sf1 (gitignored — ~170 MB of derived parquet is
not repo content; rebuild is one command, ~30 s). Not under .scratch:
the TTL GC would reap it between sessions.

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
        if not keys:  # fixed-cardinality dimension: verbatim
            q = f"SELECT * FROM read_parquet('{path}')"
        else:
            repl = [f"({k} + i * {OFFSET}) AS {k}" for k in keys]
            if t == "documents":
                # per-copy tag keeps copies from being cross-copy
                # exact/near duplicates (see module docstring)
                repl += [
                    "('c' || i || ' ' || text) AS text",
                    "(n_chars + length('c' || i || ' ')) AS n_chars",
                ]
            q = (
                f"SELECT * REPLACE ({', '.join(repl)}) "
                f"FROM read_parquet('{path}'), range({copies}) AS r(i)"
            )
        out = os.path.join(dest, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)
    con.close()
    return dest


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DEST)
