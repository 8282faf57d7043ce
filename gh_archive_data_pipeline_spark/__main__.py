"""CLI: list and run registry queries against a fixture directory.

    python -m gh_archive_data_pipeline_spark list [pattern]
    python -m gh_archive_data_pipeline_spark run q05_region_revenue \
        [--sf /root/testdata/sf0.01] [--limit 20] [--explain]
    python -m gh_archive_data_pipeline_spark sql "SELECT ... FROM lineitem" \
        [--sf DIR]

`sql` registers every fixture table as a temp view first, so ad-hoc ANSI
SQL runs against the lake exactly like the registry queries do — the
SQL-over-lake entry point (SURVEY §2.1 S9) as a shell command.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gh_archive_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("pattern", nargs="?", default="")

    p_run = sub.add_parser("run", help="run one registry query")
    p_run.add_argument("name")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--explain", action="store_true")

    p_sql = sub.add_parser("sql", help="run ad-hoc SQL over the fixture lake")
    p_sql.add_argument("query")
    p_sql.add_argument("--sf", default="/root/testdata/sf0.01")
    p_sql.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from .plans.registry import all_queries

    if args.cmd == "list":
        for name, spec in sorted(all_queries().items()):
            if args.pattern in name:
                kind = "oracle" if spec.sql else "rows-only"
                doc = spec.doc.split("\n")[0][:80]
                print(f"{name:42s} [{kind}] {doc}")
        return 0

    from .session import get_spark
    spark = get_spark(app_name=f"cli-{args.cmd}")
    try:
        if args.cmd == "run":
            specs = all_queries()
            if args.name not in specs:
                print(f"unknown query {args.name!r}; try `list`",
                      file=sys.stderr)
                return 2
            t0 = time.monotonic()
            df = specs[args.name].fn(spark, args.sf)
            if args.explain:
                df.explain("formatted")
            df.show(args.limit, truncate=False)
            print(f"# {args.name}: {time.monotonic() - t0:.2f}s")
        else:  # sql
            from .sources.readers import ALL_TABLES, load_table
            for t in ALL_TABLES:
                load_table(spark, args.sf, t).createOrReplaceTempView(t)
            spark.sql(args.query).show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
