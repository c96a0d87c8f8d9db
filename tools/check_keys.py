#!/usr/bin/env python
"""Verify a subset of registry keys against their DuckDB oracles — the
fast inner loop while adding operators (driver_sim runs ALL keys).

Usage: python tools/check_keys.py KEY [KEY ...] [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    keys = args

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from mapreduce_server_spark.sources.loader import TABLE_NAMES
    from parity import assert_fetch_dtypes, assert_parity

    spark = (
        SparkSession.builder.master(os.environ.get("MRSS_MASTER", "local[8]"))
        .appName("check-keys")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    rc = 0
    for key in keys:
        fn = queries.get(key)
        if fn is None:
            print(f"{key}: NOT REGISTERED")
            rc = 1
            continue
        try:
            df = fn(spark, sf_dir)
            sql = oracles.get(key)
            if sql is None:
                print(f"{key}: rows-only, {df.count()} rows")
            else:
                assert_parity(df, con, sql, key=key)
                assert_fetch_dtypes(df, con, sql, key=key)
                print(f"{key}: OK (oracle-exact)")
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: FAIL — {str(exc)[:400]}")
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
