"""GitHub Archive event schema — Spark-first re-expression of the
reference's declared schema (/root/reference/pipeline/schema.py:11-56).

Deliberate differences (SURVEY.md §1.2):
- ``created_at`` is parsed to TIMESTAMP_NTZ during normalization (the
  reference declared a timestampNTZFormat reader option but kept the field a
  string — /root/reference/pipeline/airflow/dags/load_data_task.py:120);
- actor/repo/org ids are int64 (LongType) everywhere, normalizing the
  reference's Avro-int vs Spark-long mismatch
  (/root/reference/pipeline/data_ingestion/avro_schemas/schema.avsc:29,54,90).
"""

from __future__ import annotations

from pyspark.sql import types as T

CREATED_AT_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _entity(nullable: bool) -> T.StructType:
    """actor/org entity struct (reference schema.py:29-41,42-53)."""
    return T.StructType([
        T.StructField("id", T.LongType(), nullable),
        T.StructField("login", T.StringType(), nullable),
        T.StructField("gravatar_id", T.StringType(), True),
        T.StructField("avatar_url", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ])


GH_EVENT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("other", T.StringType(), True),
    T.StructField("created_at", T.StringType(), False),
    T.StructField("type", T.StringType(), False),
    T.StructField("public", T.BooleanType(), False),
    T.StructField("repo", T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
    ]), False),
    T.StructField("actor", _entity(False), False),
    T.StructField("org", _entity(True), True),
    T.StructField("payload", T.StringType(), True),
])
