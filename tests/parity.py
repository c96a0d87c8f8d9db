"""Differential-compare helper emulating the driver's t2 correctness gate:
row-count + column set + order-insensitive value multiset, compared EXACTLY
(no float tolerance) — stricter than any plausible driver hash, so queries
that pass here are safe under it.
"""

from __future__ import annotations

import datetime
import decimal
import math
from collections import Counter


def _norm(v):
    if v is None:
        return None
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        v = v.to_pydatetime()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if v == 0.0:
            return ("f", 0.0)  # -0.0 == 0.0
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("f", float(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(timespec="microseconds"))
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return ("m",) + tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _multiset(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(row[i]) for i in order) for row in rows)


def _pd_kind(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    return "i" if k in "iu" else k


def assert_fetch_dtypes(spark_df, duck_con, sql: str, key: str = "?") -> None:
    """Guard against driver fetch-path dtype drift that fetchall() hides.

    The driver hashes *pandas/arrow-fetched* values on both sides. DuckDB
    types a sum of integers as HUGEINT (and a windowed sum likewise), which
    survives ``fetchall()`` as a Python int — passing the value compare —
    but degrades to float64 in the pandas fetch, while Spark's long stays
    int64: the driver hash then fails on 4 vs 4.0 even though values are
    identical (round-2 `concurrency_peak` red row). Compare the
    pandas-fetched numeric kind per column on both engines and fail any
    int-vs-float divergence loudly.
    """
    spd = spark_df.toPandas()
    dpd = duck_con.execute(sql).df()
    for c in spd.columns:
        if c not in dpd.columns:
            continue  # column-set mismatch is assert_parity's job
        sk, dk = _pd_kind(spd[c].dtype), _pd_kind(dpd[c].dtype)
        if {sk, dk} == {"i", "f"}:
            raise AssertionError(
                f"[{key}] fetched-dtype mismatch on '{c}': spark kind "
                f"'{sk}' ({spd[c].dtype}) vs duckdb kind '{dk}' "
                f"({dpd[c].dtype}) — likely an un-cast integer sum "
                f"(DuckDB HUGEINT→float64). Add ::BIGINT in the oracle."
            )


def assert_parity(spark_df, duck_con, sql: str, key: str = "?") -> None:
    srows = spark_df.collect()
    scols = list(spark_df.columns)
    cur = duck_con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), (
        f"[{key}] column mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"[{key}] row count mismatch: spark={len(srows)} duck={len(drows)}"
    )
    sm = _multiset(scols, [tuple(r) for r in srows])
    dm = _multiset(dcols, drows)
    if sm != dm:
        only_s = list((sm - dm).items())[:5]
        only_d = list((dm - sm).items())[:5]
        raise AssertionError(
            f"[{key}] value mismatch.\n  spark-only (≤5): {only_s}\n  duck-only (≤5): {only_d}"
        )
