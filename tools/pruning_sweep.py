"""Column-pruning sweep: for every registry query, inspect each parquet scan
in the optimized physical plan and report how many columns it reads per
table. Queries whose scans read (nearly) all columns of a wide table are
either legitimately wide (profilers) or missing a projection — the list is
the audit. Usage: python tools/pruning_sweep.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

TABLE_WIDTHS = {"lineitem": 16, "orders": 9, "customer": 8, "part": 9,
                "supplier": 7, "events": 6, "documents": 5, "embeddings": 3}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, ".")
    from gh_archive_data_pipeline_spark.session import get_spark
    from gh_archive_data_pipeline_spark.plans.registry import all_queries

    spark = get_spark(app_name="pruning-sweep", master="local[8]",
                      confs={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    wide: list[tuple[str, str, int, int]] = []
    n_scans = n_pruned = errors = 0
    for name, spec in sorted(all_queries().items()):
        try:
            plan = spec.fn(spark, sf)._jdf.queryExecution() \
                .optimizedPlan().toString()
        except Exception:
            errors += 1
            continue
        # Relation [cols...] parquet  — logical scan with output columns
        for m in re.finditer(r"Relation \[([^\]]*)\] parquet", plan):
            cols = [c.split("#")[0] for c in m.group(1).split(", ") if c]
            # attribute the scan to a table by a signature column
            table = None
            for t, w in TABLE_WIDTHS.items():
                sig = {"lineitem": "l_orderkey", "orders": "o_orderkey",
                       "customer": "c_custkey", "part": "p_partkey",
                       "supplier": "s_suppkey", "events": "event_id",
                       "documents": "doc_id", "embeddings": "vec_id"}[t]
                if sig in cols:
                    table = t
                    break
            if table is None:
                continue
            n_scans += 1
            width = TABLE_WIDTHS[table]
            if len(cols) < width:
                n_pruned += 1
            elif width >= 5:
                wide.append((name, table, len(cols), width))
    print(f"scans attributed: {n_scans}; pruned: {n_pruned}; "
          f"errors: {errors}")
    print(f"full-width scans of wide tables ({len(wide)}):")
    for name, table, got, width in wide:
        print(f"  {name}: {table} reads {got}/{width}")
    spark.stop()


if __name__ == "__main__":
    main()
