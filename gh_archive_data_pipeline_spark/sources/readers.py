"""Readers over the engine's batch sources.

Covers the reference's scan surface (SURVEY.md §2.1):
- S2 JSON-with-explicit-schema (/root/reference/pipeline/airflow/dags/load_data_task.py:117-121)
- S3/S4 parquet lake scan (data_profiling.py:41)
- S8 JDBC scan (declared surface)
plus the fixture loader used by every registry query.

Scale notes: all readers return lazily-planned DataFrames; filters/projections
applied by callers push down to the parquet scan through Catalyst (verified
via .explain → PushedFilters/ReadSchema). No data touches the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..session import ensure_runtime_confs

# Fixture tables the driver pre-registers as DuckDB views (TESTDATA.md).
TPCH_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem")
ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")


def source_stamp(src: str) -> float:
    """Freshness fingerprint of a fixture source path (file or directory):
    the newest mtime underneath. Shared by every materialized-index cache
    (_ivf_cached_index / _srp_cached_index / _cached_minhash_index /
    _ivf_appended_index) so a regenerated fixture triggers a rebuild
    instead of silently serving stale data."""
    if os.path.isdir(src):
        stamps = [os.path.getmtime(os.path.join(src, f))
                  for f in os.listdir(src)] or [os.path.getmtime(src)]
        return max(stamps)
    return os.path.getmtime(src)


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved through the JVM Hadoop API.

    ``os.path``/``shutil`` silently no-op on ``hdfs://`` / ``s3a://`` URIs —
    the deployments the materialized-index docstrings advertise — which
    would leave exactly the stale generations a rebuild claims to clear.
    Every existence check / recursive delete / rename on an index directory
    goes through this instead; for a plain local path the resolved FS is
    the local filesystem, so fixture behavior is unchanged."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical-encoding quirks.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations: parquet TIMESTAMP(NANOS) (read as raw int64 via
    ``spark.sql.legacy.parquet.nanosAsLong``) and plain TIMESTAMP(MICROS)
    (read natively as timestamp_ntz). Either way callers get both:
      - ``ts``     timestamp_ntz (micros, matching DuckDB's read of the file)
      - ``ts_ns``  int64 nanos (exact event-time arithmetic without
                   interval types; also what a 100 TB layout would sort by)
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if dict(df.dtypes).get("ts") == "bigint":
            df = (
                df.withColumn("ts_ns", F.col("ts"))
                  .withColumn(
                      "ts",
                      F.timestamp_micros(F.expr("ts div 1000"))
                      .cast("timestamp_ntz"),
                  )
            )
        else:
            # Session tz is UTC (RUNTIME_CONFS), so ntz→timestamp keeps the
            # underlying micros unchanged.
            df = df.withColumn(
                "ts_ns",
                (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
                .cast("bigint"),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                *names: str) -> dict[str, DataFrame]:
    """Load several fixture tables at once (defaults to all of them)."""
    return {n: load_table(spark, sf_dir, n) for n in (names or ALL_TABLES)}


def plan_size_bytes(df: DataFrame) -> int:
    """Optimizer-estimated size of ``df`` in bytes (plan statistics — no
    job). On any introspection failure returns ``sys.maxsize`` so callers
    treat the input as LARGE (the scale-safe default)."""
    import sys

    try:
        return int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        return sys.maxsize


def scan_parallel(df: DataFrame) -> DataFrame:
    """Small-file parallelism gate (round 11, generalizing the
    minhash_near_dup gate): when the scan has fewer partitions than the
    cluster has slots, round-robin repartition so downstream SCAN-SIDE
    compute (shingling, md5 token vectors, feature extraction, HOF
    vector math) uses every core instead of one.

    A single-row-group parquet file — the shape of every local fixture
    table — is unsplittable, so the scan and EVERYTHING until the first
    exchange otherwise run in ONE task (measured: the whole q419 scoring
    chain single-threaded on local[32]). Cluster scans have many splits,
    so ``getNumPartitions() >= defaultParallelism`` holds and this
    shuffle never happens at scale — the gate is input-layout-adaptive,
    not core-count-tuned. Use it ONLY where per-row compute dominates
    the scan: for scans feeding a plain aggregation the extra exchange
    of full-width rows costs more than the single-task partial agg.

    Round-robin placement (deterministic under Spark's
    sort-before-repartition) only moves rows between tasks; callers'
    results must not depend on row placement — true for every consumer
    here (per-row projections followed by key-grouped exact aggregates)."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def read_json_with_schema(spark: SparkSession, path: str, schema: StructType,
                          timestamp_ntz_format: str | None = None,
                          multi_line: bool = False) -> DataFrame:
    """JSON-lines scan with an explicit schema — no inference pass.

    Parity with the reference's silver load
    (/root/reference/pipeline/airflow/dags/load_data_task.py:117-121); Spark
    reads ``.json.gz`` transparently so the same call serves the gz archive
    files at scale (one task per file — pair with a repartition after read
    since gzip is not splittable).
    """
    ensure_runtime_confs(spark)
    reader = spark.read.schema(schema)
    if timestamp_ntz_format:
        reader = reader.option("timestampNTZFormat", timestamp_ntz_format)
    if multi_line:
        # Pretty-printed JSON (one object across many lines — the shape of
        # the reference's checked-in sample hour) parses only in multiLine
        # mode; note multiLine makes each FILE one task, so it's for small
        # sample/config payloads, never the bulk ingest path.
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def read_jdbc(spark: SparkSession, url: str, table: str,
              properties: dict[str, str] | None = None,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int | None = None) -> DataFrame:
    """JDBC scan (S8). Partitioned read options exposed because a 100 TB
    deployment must never read a warehouse table through a single connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions or 32)))
    return reader.load()


def read_csv_with_schema(spark: SparkSession, path: str, schema: str,
                         header: bool = False,
                         mode: str = "PERMISSIVE") -> DataFrame:
    """CSV ingest with an explicit schema and corrupt-row capture: malformed
    rows null-fill and land their raw text in ``_corrupt_record`` instead of
    failing the job (or silently dropping, DROPMALFORMED). Explicit schema —
    inference is a full extra pass over 100 TB and nondeterministic under
    sampling."""
    from pyspark.sql.types import StringType
    from pyspark.sql.types import StructType as _St

    st = _St.fromDDL(schema).add("_corrupt_record", StringType())
    return (spark.read.schema(st)
            .option("header", str(header).lower())
            .option("mode", mode)
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path))


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Raw-asset ingest (images/audio/video files → the lake's binary
    columns): Spark's ``binaryFile`` source yields one row per file —
    (path, modificationTime, length, content) — with directory-partition
    discovery, so a date-partitioned asset drop reads with partition
    pruning like any table. ``glob`` filters at FILE LISTING time
    (pathGlobFilter — unmatched files cost zero I/O, not a post-filter).
    Task sizing: file-to-partition packing is governed by the SESSION
    conf ``spark.sql.files.maxPartitionBytes`` (a reader .option of that
    name is silently ignored — verified), so size that conf for the asset
    mix before the action. The multimodal operators
    (operators/multimodal.py) consume exactly this shape: content stays
    an opaque binary column and never crosses a shuffle — extract
    features first, then aggregate."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_text_lines(spark: SparkSession, path: str,
                    whole_file: bool = False,
                    line_sep: str | None = None) -> DataFrame:
    """Plain-text corpus ingest: one row per line (``value`` string), or
    one row per FILE with ``whole_file=True`` (wholetext — the shape a
    document-level pipeline wants before its own chunking, q115). A
    custom ``line_sep`` handles corpora delimited by e.g. NUL or double
    newline. Text is the rawest LLM-corpus format; everything downstream
    (language ID, quality rules, dedup) starts from this scan."""
    # NB: text() takes these as parameters, not .option()s — the method's
    # own defaults overwrite reader options of the same name (verified).
    return spark.read.text(path, wholetext=whole_file, lineSep=line_sep)
