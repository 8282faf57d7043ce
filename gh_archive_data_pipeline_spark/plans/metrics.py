"""Execution introspection — EXPLAIN ANALYZE as a DataFrame.

After an action, every physical operator carries runtime SQL metrics
(rows output, shuffle bytes, spill, scan time). ``plan_metrics`` walks the
executed plan and lands them as queryable rows — the batch complement of
streaming/metrics.py, and the raw material for the regression checks a
perf CI needs ("did shuffle bytes for q05 grow 10×?").

Works on the AQE-final plan, so what you read is what actually ran —
including runtime replans (coalesced partitions, skew splits, demoted
broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

METRIC_SCHEMA = ("node_id bigint, node string, metric string, value bigint")


def plan_metrics(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute ``df`` and return its physical plan's runtime metrics as
    rows (node_id, node, metric, value). Metric values are post-execution
    accumulator totals across all tasks.

    Executes via ``collect()`` on df's OWN QueryExecution — a ``count()``
    would build a separate aggregating plan and leave df's accumulators
    untouched (all zeros)."""
    df.collect()
    rows: list[tuple] = []

    def walk(node) -> None:
        nid = node.id()
        name = node.nodeName()
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            rows.append((nid, name, kv._1(), kv._2().value()))
        children = node.children()
        cit = children.iterator()
        while cit.hasNext():
            walk(cit.next())
        # AQE wraps subtrees in QueryStageExec whose child is via .plan()
        if name.endswith("QueryStageExec") or "QueryStage" in name:
            try:
                walk(node.plan())
            except Exception:
                pass

    qe = df._jdf.queryExecution()
    walk(qe.executedPlan())
    return spark.createDataFrame(rows, METRIC_SCHEMA)


def scan_output_rows(metrics: DataFrame) -> int:
    """Total rows produced by scan nodes — the 'rows read' headline."""
    from pyspark.sql import functions as F

    row = (metrics
           .filter(F.col("node").contains("Scan")
                   & (F.col("metric") == "numOutputRows"))
           .agg(F.sum("value").alias("s")).collect()[0])
    return int(row.s or 0)
