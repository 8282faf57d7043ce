"""JDBC warehouse contract (K3/K4/S8) — pinned without a database.

The sandbox has no Postgres (VERDICT round 2+: environment-blocked), so the
live round trip can't run; what CAN be pinned is everything up to the
socket: the exact option dict the writer sends (bulk-load tuning,
reference load_data_task.py:193-236 parity) and the CREATE TABLE type
mapping Spark's PostgresDialect would emit for the gold-table schemas.
"""

from __future__ import annotations

import pytest

from gh_archive_data_pipeline_spark.sources.writers import (
    jdbc_ddl_types, jdbc_write_options)


def test_write_options_bulk_load_contract():
    opts = jdbc_write_options("jdbc:postgresql://wh/gold", "events")
    # reference parity: isolationLevel=NONE append bulk-load
    assert opts == {"url": "jdbc:postgresql://wh/gold", "dbtable": "events",
                    "isolationLevel": "NONE", "batchsize": "10000"}
    # all values stringly-typed (the DataSource options API takes strings)
    assert all(isinstance(v, str) for v in opts.values())


def test_write_options_properties_layer_but_cannot_shadow():
    opts = jdbc_write_options(
        "jdbc:postgresql://wh/gold", "users", batchsize=50_000,
        properties={"user": "loader", "reWriteBatchedInserts": "true"})
    assert opts["batchsize"] == "50000"
    assert opts["user"] == "loader"
    assert opts["reWriteBatchedInserts"] == "true"
    for shadow in ("url", "dbtable", "isolationLevel", "batchsize"):
        with pytest.raises(ValueError, match="named parameter"):
            jdbc_write_options("jdbc:postgresql://wh/gold", "users",
                               properties={shadow: "x"})


def test_postgres_ddl_type_mapping(spark):
    """The DDL the writer would issue for the gold `events` table shape:
    dialect overrides (TEXT, FLOAT8, TIMESTAMPTZ) + common JDBC fallbacks
    (BIGINT, INTEGER) — resolved through Spark's own PostgresDialect, so
    this pins OUR schema against THE dialect Spark ships."""
    from pyspark.sql.types import (BooleanType, DoubleType, IntegerType,
                                   LongType, StringType, StructField,
                                   StructType, TimestampType)

    schema = StructType([
        StructField("id", LongType()),
        StructField("type", StringType()),
        StructField("public", BooleanType()),
        StructField("created_at", TimestampType()),
        StructField("actor_id", IntegerType()),
        StructField("score", DoubleType()),
    ])
    got = jdbc_ddl_types(spark, "jdbc:postgresql://wh/gold", schema)
    assert got == {
        "id": "BIGINT",
        "type": "TEXT",
        "public": "BOOLEAN",
        "created_at": "TIMESTAMP WITH TIME ZONE",
        "actor_id": "INTEGER",
        "score": "FLOAT8",
    }


def test_dialect_dispatch_differs_by_url(spark):
    """The url picks the dialect: the same string column maps to TEXT on
    Postgres but LONGTEXT on MySQL — i.e. the mapping really is
    dialect-resolved, not hardcoded."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("t", StringType())])
    pg = jdbc_ddl_types(spark, "jdbc:postgresql://wh/db", schema)
    my = jdbc_ddl_types(spark, "jdbc:mysql://wh/db", schema)
    assert pg["t"] == "TEXT"
    assert my["t"] == "LONGTEXT"
