"""Structured Streaming surface (SURVEY.md §2.11 T1-T9).

The reference's streaming path (Kafka → Structured Streaming → Delta append
with checkpoint, /root/reference/pipeline/data_ingestion/
spark_structured_datastream.py:56-79) rebuilt with:
- a source-agnostic reader (kafka / file / rate) so the identical
  transformation graph is testable with deterministic file sources;
- real watermarking (the reference disabled watermarks in its abandoned
  Flink path, flink_datastream.py:69);
- `availableNow` trigger — bounded catch-up runs realizing the reference's
  "periodic cluster instead of always-on" cost note (README.md:297);
- checkpointed parquet sink via `.start(path)` (the reference passed a path
  to `.toTable()`, a latent bug noted in SURVEY.md §2.2 K2).

Scale notes: stream state (windows, dedup sets) lives in the state store,
keyed by group key — the watermark bounds its size; without a watermark,
state grows forever, which is why every stateful helper here requires one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


# ---------------------------------------------------------------------------
# sources (T1 / S5)
# ---------------------------------------------------------------------------

def read_kafka_stream(spark: SparkSession, bootstrap_servers: str,
                      topics: str | list[str],
                      starting_offsets: str = "earliest") -> DataFrame:
    """Kafka source. Multi-topic subscription is one comma-joined option —
    the reference's second .option("subscribe") silently overwrote the first
    (spark_structured_datastream.py:59-61, SURVEY.md T1 latent bug)."""
    subscribe = topics if isinstance(topics, str) else ",".join(topics)
    return (spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", subscribe)
            .option("startingOffsets", starting_offsets)
            .load())


def read_file_stream(spark: SparkSession, path: str, schema: StructType,
                     fmt: str = "parquet",
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File source — the deterministic test/harness substitute for Kafka;
    also the production pattern for landing-zone ingestion."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


# ---------------------------------------------------------------------------
# event-time transforms (T4-T7)
# ---------------------------------------------------------------------------

def _event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (not TIMESTAMP_NTZ); cast at the operator
    boundary — wall-clock-preserving because the engine pins the session
    timezone to UTC (session.RUNTIME_CONFS)."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type", window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """T4+T5: watermarked tumbling/sliding counts — the streaming twin of the
    batch q50/q51 plans (same expressions, incremental execution)."""
    events = _event_time(events, ts_col)
    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                key_col, "n_events", "total_value")
    )


def sessionized(events: DataFrame, ts_col: str = "ts",
                key_col: str = "user_id", gap: str = "30 minutes",
                watermark: str = "2 hours") -> DataFrame:
    """T6: session windows with merging state (streaming twin of q52)."""
    events = _event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("session_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("session_start"),
                key_col, "n_events", "session_value")
    )


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           ts_col: str = "ts",
                           watermark: str = "2 hours") -> DataFrame:
    """T7: stateful key dedup bounded by the watermark — state for a key is
    dropped once the watermark passes it, so state size tracks the watermark
    horizon, not the stream length (the unbounded-state trap the reference's
    future-work note points at, README.md:303)."""
    events = _event_time(events, ts_col)
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


# ---------------------------------------------------------------------------
# sinks / lifecycle (T2, T3, T9, K2)
# ---------------------------------------------------------------------------

def start_parquet_sink(df: DataFrame, path: str, checkpoint: str,
                       output_mode: str = "append",
                       available_now: bool = True,
                       processing_time: str | None = None) -> StreamingQuery:
    """K2/T2/T9: checkpointed parquet sink. availableNow=True drains all
    currently-available input then stops — exactly-once batch catch-up; pass
    processing_time for an always-on micro-batch cadence instead."""
    writer = (df.writeStream.format("parquet")
              .outputMode(output_mode)
              .option("path", path)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_console_sink(df: DataFrame, output_mode: str = "append",
                       num_rows: int = 20, truncate: bool = True,
                       available_now: bool = True) -> StreamingQuery:
    """K6: console debugging sink (reference
    spark_structured_datastream.py:74, there commented out) — prints each
    micro-batch to the driver's stdout. Strictly a development tap: the
    driver materializes ``num_rows`` per batch, so it is never a
    production drain (the checkpointed parquet/upsert sinks are)."""
    writer = (df.writeStream.format("console")
              .outputMode(output_mode)
              .option("numRows", str(num_rows))
              .option("truncate", str(truncate).lower()))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_to_memory(df: DataFrame, name: str, spark: SparkSession,
                  output_mode: str = "complete",
                  timeout_sec: int = 120,
                  state_partitions: int | None = 8) -> DataFrame:
    """Drain a stream into an in-memory table (availableNow) and return the
    result as a batch DataFrame — the deterministic harness used by the
    streaming registry queries and tests.

    ``state_partitions`` bounds the stateful-shuffle width for this query:
    the partition count is baked into the state store at query start, and
    each partition costs a state-store instance + checkpoint files per
    micro-batch — 32 idle stores tripled the wall time of a 100k-row drain.
    Size it to state volume, not to CPU count (conf restored after start)."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (df.writeStream.format("memory")
             .queryName(name)
             .outputMode(output_mode)
             .trigger(availableNow=True)
             .start())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    if not q.awaitTermination(timeout_sec):
        # A silent partial drain would surface as a WRONG result downstream;
        # a loud timeout is strictly better.
        q.stop()
        raise TimeoutError(
            f"streaming drain {name!r} did not finish in {timeout_sec}s")
    return spark.table(name)


def start_upsert_sink(df: DataFrame, path: str, checkpoint: str,
                      keys: list[str],
                      spark: SparkSession,
                      order_by: list[str] | None = None) -> StreamingQuery:
    """Streaming upsert into a parquet gold table via foreachBatch — the
    MERGE/upsert pattern (reference writes Delta appends; Delta MERGE is the
    managed version of exactly this loop).

    Per micro-batch: batch rows REPLACE existing rows with the same key
    (dedup within the batch keeps the last row per key), everything else is
    carried over, and the table is atomically swapped in. foreachBatch may
    re-deliver a batch after failure; the merge is idempotent on keys, so
    replays converge — the exactly-once recipe for non-transactional sinks.

    Scale note: this demo rewrites the whole table per batch, which is the
    contract of a parquet-only sink. At 100 TB the same function bodies a
    partition-scoped rewrite (join batch keys → affected partitions →
    rewrite only those) or a Delta/Iceberg MERGE — the streaming plumbing
    (checkpoint, trigger, idempotent batch fn) is unchanged.
    """
    import os
    import shutil
    import uuid

    from pyspark.sql import Window

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        # "last write wins": by the caller's event-time columns when given
        # (deterministic across re-reads), else by arrival order.
        order_cols = ([F.col(c).desc() for c in order_by] if order_by
                      else [F.monotonically_increasing_id().desc()])
        w = Window.partitionBy(*keys).orderBy(*order_cols)
        latest = (batch.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))
        out = latest
        if os.path.exists(path):
            existing = batch.sparkSession.read.parquet(path)
            kept = existing.join(latest.select(*keys), keys, "left_anti")
            out = kept.unionByName(latest)
        tmp = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
        out.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    return (df.writeStream
            .foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
