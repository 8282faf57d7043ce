"""Full driver rehearsal: run EVERY registry query and its DuckDB oracle
side-by-side from a plain SparkSession (no engine confs — exactly how the
driver's harness does it), compare rows/columns/values, and report per-query
wall time. This is the end-to-end dress rehearsal for CORRECTNESS_r{N}.

Usage: python tools/driver_rehearsal.py [sf_dir] [name_filter]
(sf_dir default /root/testdata/sf0.01; name_filter = comma-separated
substrings — run only queries whose name contains one, e.g. "q386,q388")

Floats compare BIT-EXACT by default — the driver hashes exact values, so
a relative tolerance is a blind spot for large-magnitude floats whose
rounding-edge flips are relatively tiny (round 4 found 417657971.58 vs
.60: 2 cents at 4.2e8 = 5e-11 relative, invisible at 1e-9 — fatal to the
hash). The whole registry is bit-exact at sf0.001 and sf0.01 since round
4 (floor-cents convention); SPARK_REHEARSAL_TOLERANT=1 restores the old
1e-9 compare for debugging a new query's drift.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

EXACT = os.environ.get("SPARK_REHEARSAL_TOLERANT") != "1"


def compare(spdf: pd.DataFrame, ddf: pd.DataFrame) -> str | None:
    if sorted(spdf.columns) != sorted(ddf.columns):
        return f"columns {sorted(spdf.columns)} vs {sorted(ddf.columns)}"
    if len(spdf) != len(ddf):
        return f"rows {len(spdf)} vs {len(ddf)}"
    cols = sorted(spdf.columns)
    a = spdf.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
    b = ddf.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
    for c in cols:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if EXACT:
                    if x != y:
                        return f"{c}[{i}]: {x!r} != {y!r} (exact)"
                elif abs(x - y) > 1e-9 * max(1.0, abs(y)):
                    return f"{c}[{i}]: {x!r} != {y!r}"
            else:
                xn = x is None or x is pd.NaT or (isinstance(x, float) and math.isnan(x))
                yn = y is None or y is pd.NaT or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                if x != y:
                    return f"{c}[{i}]: {x!r} != {y!r}"
    return None


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, ".")
    import __spark_entry__ as mod
    qs, oracles = mod.queries(), mod.oracle_sql()
    if len(sys.argv) > 2:
        subs = sys.argv[2].split(",")
        qs = {n: f for n, f in qs.items() if any(s in n for s in subs)}
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_ok = n_rows_only = 0
    failures: list[tuple[str, str]] = []
    slow: list[tuple[str, float]] = []
    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            spdf = qs[name](spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {str(e)[:160]}"))
            continue
        dt = time.monotonic() - t0
        if dt > 8:
            slow.append((name, round(dt, 1)))
        if name not in oracles:
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {str(e)[:160]}"))
            continue
        err = compare(spdf, ddf)
        if err:
            failures.append((name, err))
        else:
            n_ok += 1
    print(f"\n=== rehearsal @ {sf}: {n_ok} oracle-matched, "
          f"{n_rows_only} rows-only, {len(failures)} failures ===")
    for name, err in failures:
        print("FAIL", name, "--", err)
    if slow:
        print("slow (>8s):", slow)
    spark.stop()


if __name__ == "__main__":
    main()
