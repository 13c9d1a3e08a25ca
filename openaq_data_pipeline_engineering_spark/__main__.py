"""Command-line surface for the engine.

The reference exposes its query surface through Athena consoles and
ad-hoc scripts (reference utils/athena_utils.py:38-175); the engine's
equivalent is one CLI over the declared-query registry and the SQL
facade:

    python -m openaq_data_pipeline_engineering_spark list
    python -m openaq_data_pipeline_engineering_spark run flagship_daily_topk \
        --sf-dir /root/testdata/sf0.01 --show 10
    python -m openaq_data_pipeline_engineering_spark explain dedup_window
    python -m openaq_data_pipeline_engineering_spark sql \
        "SELECT count(*) AS n FROM lineitem" --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="openaq_data_pipeline_engineering_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list declared queries with descriptions")

    run = sub.add_parser("run", help="run a declared query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    run.add_argument("--show", type=int, default=20,
                     help="rows to print (0 = count only)")

    exp = sub.add_parser("explain", help="print a query's physical plan")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

    sql = sub.add_parser("sql", help="run SQL over the star tables")
    sql.add_argument("statement")
    sql.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    sql.add_argument("--show", type=int, default=20)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from openaq_data_pipeline_engineering_spark.plans.registry import (
        QUERIES,
        _load_all,
    )

    if args.cmd == "list":
        _load_all()
        for name in sorted(QUERIES):
            q = QUERIES[name]
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} [{oracle}] {q.doc}")
        return 0

    from openaq_data_pipeline_engineering_spark.engine import Engine, get_spark

    spark = get_spark(app_name=f"aqueduct-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "sql":
        from openaq_data_pipeline_engineering_spark.sources.star import (
            STAR_TABLES,
            load_star,
        )

        load_star(spark, args.sf_dir, STAR_TABLES)
        df = Engine(spark).sql(args.statement)
        df.show(args.show, truncate=False) if args.show else print(df.count())
        return 0

    _load_all()
    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
        return 2
    df = QUERIES[args.query].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    elif args.show:
        df.show(args.show, truncate=False)
    else:
        print(df.count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
