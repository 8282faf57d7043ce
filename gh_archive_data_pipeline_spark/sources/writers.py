"""Writers — the reference's sink surface (SURVEY.md §2.2) rebuilt:

- K1/K5 partitioned parquet lake writes (Delta-optional)
- K3/K4 JDBC warehouse writes with bulk-load options
- K2 streaming parquet sink with checkpointing (see streaming.pipeline)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  max_records_per_file: int = 5_000_000,
                  coalesce: int | None = None) -> None:
    """Lake write (reference Delta overwrite, load_data_task.py:140-145,
    generalized). ``coalesce`` tames the small-file problem the reference
    flags for streaming output (README.md:299); ``maxRecordsPerFile`` caps
    file size so single partitions can't produce multi-GB files at scale."""
    if coalesce:
        df = df.coalesce(coalesce)
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_delta(df: DataFrame, path: str, mode: str = "overwrite",
                overwrite_schema: bool = False) -> None:
    """Delta write when delta-spark jars are on the classpath (reference
    load_data_task.py:140-145); raises a clear error otherwise — the engine
    core deliberately depends only on parquet."""
    writer = df.write.format("delta").mode(mode)
    if overwrite_schema:
        writer = writer.option("overwriteSchema", "true")
    try:
        writer.save(path)
    except Exception as exc:  # pragma: no cover - jar-dependent
        raise RuntimeError(
            "Delta writer requires the delta-spark jars on the classpath; "
            "use write_parquet for the jar-free path"
        ) from exc


def jdbc_write_options(url: str, table: str,
                       isolation_level: str = "NONE",
                       batchsize: int = 10_000,
                       properties: dict[str, str] | None = None
                       ) -> dict[str, str]:
    """The exact option dict :func:`write_jdbc` hands the JDBC data source —
    factored pure so the warehouse-load contract is unit-testable in a
    sandbox with no database (the writer itself needs a live server; the
    options it would send do not). Caller ``properties`` layer on top but
    may not silently override the bulk-load keys — a property that changes
    ``isolationLevel``/``batchsize`` semantics must be passed through the
    named parameters where it's visible."""
    opts = {
        "url": url,
        "dbtable": table,
        # reference parity: isolationLevel=NONE bulk-load tuning
        # (load_data_task.py:199)
        "isolationLevel": isolation_level,
        "batchsize": str(batchsize),
    }
    for k, v in (properties or {}).items():
        if k in ("url", "dbtable", "isolationLevel", "batchsize"):
            raise ValueError(
                f"pass {k!r} via the named parameter, not properties")
        opts[k] = str(v)
    return opts


def jdbc_ddl_types(spark, url: str, schema) -> dict[str, str]:
    """Database column type per field — the CREATE TABLE DDL the JDBC
    writer would issue for ``schema`` against ``url``'s dialect, resolved
    through Spark's own JdbcDialect (dialect override first, common JDBC
    fallback second — the same lookup JdbcUtils.schemaString performs).
    Lets a deployment review/pin the warehouse DDL without a server:
    e.g. Postgres maps string→TEXT, double→FLOAT8,
    timestamp→TIMESTAMP WITH TIME ZONE."""
    jvm = spark._jvm
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    jdbc_utils = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    out = {}
    for field in schema.fields:
        jdt = jvm.org.apache.spark.sql.types.DataType.fromJson(
            field.dataType.json())
        opt = dialect.getJDBCType(jdt)
        if not opt.isDefined():
            opt = jdbc_utils.getCommonJDBCType(jdt)
        if not opt.isDefined():
            raise ValueError(
                f"no JDBC type for column {field.name}: {field.dataType}")
        out[field.name] = opt.get().databaseTypeDefinition()
    return out


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               properties: dict[str, str] | None = None,
               isolation_level: str = "NONE",
               batchsize: int = 10_000,
               num_partitions: int | None = None) -> None:
    """Warehouse write (reference load_data_task.py:193-236). Keeps the
    reference's isolationLevel=NONE bulk-load tuning; numPartitions bounds
    concurrent connections — mandatory when 1000 executors each hold a
    JDBC connection. Options are built by :func:`jdbc_write_options` (the
    unit-tested contract); only the final ``save()`` needs a live server."""
    if num_partitions:
        df = df.coalesce(num_partitions)
    writer = df.write.format("jdbc").mode(mode)
    for k, v in jdbc_write_options(url, table, isolation_level,
                                   batchsize, properties).items():
        writer = writer.option(k, v)
    writer.save()


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite", fmt: str = "parquet") -> None:
    """Bucketed managed table: pre-shuffles data into ``num_buckets`` hash
    buckets on ``bucket_cols`` at WRITE time, so every later join or
    aggregation on those columns is exchange-free — pay the shuffle once,
    reuse it for every downstream query. ``sort_cols`` additionally sorts
    within buckets, upgrading joins to zero-sort sort-merge.

    This is the co-located-join lever for 100 TB fact⋈fact joins where
    neither side broadcasts (bucket both on the join key with equal bucket
    counts). Requires saveAsTable (bucket metadata lives in the catalog)."""
    writer = (df.write.format(fmt).mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              compression: str = "zstd") -> None:
    """ORC lake write — the columnar alternative where the surrounding stack
    (Hive/Trino ACID tables) prefers ORC over parquet; same pushdown and
    pruning properties under Spark's vectorized ORC reader."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_clustered(df: DataFrame, path: str, cluster_by: list[str],
                    num_files: int = 8, mode: str = "overwrite") -> None:
    """Clustered lake layout: range-repartition on the cluster keys, sort
    within each partition, write one file per partition. Files then hold
    disjoint key ranges with tight parquet min/max stats, so point and
    range predicates on the cluster keys skip whole files/row-groups at
    scan time — the sorted-layout complement to directory partitioning
    (low-cardinality keys partition; high-cardinality keys cluster)."""
    (df.repartitionByRange(num_files, *cluster_by)
     .sortWithinPartitions(*cluster_by)
     .write.mode(mode).parquet(path))


def compact(spark, path: str, target_file_bytes: int = 128 * 1024 * 1024,
            cluster_by: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(bytes/target) files (optionally re-clustered), atomically swapped
    in. Returns the new file count.

    The streaming-sink hangover the reference flags (README.md:299): every
    micro-batch appends files, and a year of hours is 10^5 tiny files whose
    footer/open cost dominates scans. Compaction is a maintenance job, not
    a query — run it on cold partitions (here: whole dir; at scale: per
    partition, skipping ones already compact)."""
    import glob as _glob
    import math
    import os
    import shutil
    import uuid

    total = sum(os.path.getsize(f)
                for f in _glob.glob(os.path.join(path, "*.parquet")))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    if cluster_by:
        (df.repartitionByRange(n_files, *cluster_by)
         .sortWithinPartitions(*cluster_by)
         .write.mode("overwrite").parquet(tmp))
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(_glob.glob(os.path.join(path, "*.parquet")))


def write_json(df, path: str, partition_by: list[str] | None = None,
               compression: str | None = "gzip") -> None:
    """JSON-lines batch export (K-family): the interchange format for
    downstream tools that don't read parquet. Gzip-compressed by default —
    line-JSON compresses ~10x and stays splittable at the file level (one
    file per partition task, sized by the upstream repartition)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
