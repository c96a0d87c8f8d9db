"""CLI façade — the "server" surface of the reference, minus the server.

The reference accepts job submissions over RPC (SURVEY.md §3.4); on Spark
the cluster manager owns scheduling, so the equivalent user surface is a
submit command:

    python -m mapreduce_server_spark list
    python -m mapreduce_server_spark run q1_pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain]
    python -m mapreduce_server_spark sql "SELECT ... FROM events ..."

``run`` executes one registered query and prints the result (or its
physical plan with --explain); ``sql`` registers the fixture tables as
temp views (through the normalizing loader) and runs an ad-hoc Spark SQL
statement — the migration path for users' one-off queries that have no
registry key.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="mapreduce_server_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    runp = sub.add_parser("run", help="run one registered query")
    runp.add_argument("key")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true")
    sqlp = sub.add_parser(
        "sql", help="run ad-hoc Spark SQL with the fixture tables as views"
    )
    sqlp.add_argument("statement")
    sqlp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sqlp.add_argument("--limit", type=int, default=20)
    sqlp.add_argument("--explain", action="store_true")
    args = parser.parse_args(argv)

    from mapreduce_server_spark import REGISTRY

    if args.cmd == "list":
        for key, spec in sorted(REGISTRY.items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{key:28s} {spec.category:14s} {oracle}")
        return 0

    from mapreduce_server_spark.session import get_spark

    if args.cmd == "sql":
        from mapreduce_server_spark.sources.loader import TABLE_NAMES, load_table

        spark = get_spark(app_name="mrss-sql")
        spark.sparkContext.setLogLevel("ERROR")
        for t in TABLE_NAMES:
            load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        df = spark.sql(args.statement)
        if args.explain:
            from mapreduce_server_spark.plans import plan_string

            print(plan_string(df, "formatted"))
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.key not in REGISTRY:
        print(f"unknown query {args.key!r}; try: python -m mapreduce_server_spark list")
        return 2
    spark = get_spark(app_name=f"mrss-run-{args.key}")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.key].fn(spark, args.sf_dir)
    if args.explain:
        from mapreduce_server_spark.plans import plan_string

        print(plan_string(df, "formatted"))
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
