"""Confluent-framed Avro codec helpers (SURVEY.md §2.1 S6, §2.2 K7).

The Confluent wire format is: magic byte 0x00 + 4-byte big-endian schema id
+ Avro body (reference producer: /root/reference/pipeline/data_ingestion/
kafka_producer/produce_fake_data.py:88-118). The reference imported
``from_avro`` but left the decode commented out
(spark_structured_datastream.py:8,64-70); here the header handling is a
real, unit-tested column expression, and the Avro body decode delegates to
``pyspark.sql.avro.functions.from_avro`` when the spark-avro jar is present
(it is an external package, so it is import-gated).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CONFLUENT_HEADER_BYTES = 5


def confluent_schema_id(value: Column) -> Column:
    """Extract the 4-byte big-endian schema id from a Confluent-framed
    message (bytes 2-5): hex-encode those bytes and parse base-16 — pure
    built-ins, no UDF."""
    return (
        F.conv(F.hex(F.substring(value, 2, 4)), 16, 10)
        .cast("bigint")
        .alias("schema_id")
    )


def strip_confluent_header(value: Column) -> Column:
    """Drop the 5-byte header, leaving the raw Avro body."""
    # substring clamps to the input length, so "rest of the bytes" is just a
    # max-int length — works on the passed column, whatever its name.
    return F.substring(value, CONFLUENT_HEADER_BYTES + 1, (1 << 31) - 1)


def decode_confluent_avro(value: Column, avro_schema_json: str) -> Column:
    """Header-strip + from_avro. Requires the spark-avro jar (external
    package); raises a clear error when absent so callers can fall back to
    JSON twins (the reference topics carry both encodings)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover - jar/environment dependent
        raise RuntimeError(
            "from_avro requires the org.apache.spark:spark-avro package on "
            "the session classpath"
        ) from exc
    return from_avro(strip_confluent_header(value), avro_schema_json)


def encode_confluent_header(schema_id: int) -> bytes:
    """Producer-side framing: magic 0x00 + schema id (big-endian int32)."""
    return b"\x00" + schema_id.to_bytes(4, "big")
