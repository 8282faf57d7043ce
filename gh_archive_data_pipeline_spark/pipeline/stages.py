"""Bronze → silver → gold stages of the GH-Archive ELT pipeline, rebuilt
Spark-first (reference flow: /root/reference/pipeline/airflow/dags/
load_data_task.py:63-236; SURVEY.md §3.1).

Differences from the reference, by design:
- silver parses ``created_at`` to TIMESTAMP_NTZ (the reference left it a
  string) and is written partitioned by event date — at 100 TB, date/hour
  partition pruning is the single biggest lever on every downstream query;
- gold ``events`` is deduplicated by event id keeping the earliest row
  (the reference appends blind, documented as its duplication defect,
  /root/reference/README.md:303);
- storage is plain parquet (Delta jars optional; fixtures are parquet).
"""

from __future__ import annotations

import gzip
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_json_with_schema
from .schema import CREATED_AT_FORMAT, GH_EVENT_SCHEMA

GH_ARCHIVE_URL = "https://data.gharchive.org/{y}-{m:02d}-{d:02d}-{h}.json.gz"


# ---------------------------------------------------------------------------
# bronze: acquire raw hourly archives
# ---------------------------------------------------------------------------

def download_hour(year: int, month: int, day: int, hour: int,
                  dest_dir: str) -> str:
    """Fetch one GH Archive hour file and gunzip it next to the download
    (reference download_to_bronze, load_data_task.py:63-89). Driver-side by
    necessity (single HTTP object); at scale, list many hour URLs and let
    ``spark.read.json`` pull the .json.gz files directly — one task each."""
    import urllib.request

    os.makedirs(dest_dir, exist_ok=True)
    url = GH_ARCHIVE_URL.format(y=year, m=month, d=day, h=hour)
    gz_path = os.path.join(dest_dir, os.path.basename(url))
    json_path = gz_path[:-3]
    with urllib.request.urlopen(url, timeout=60) as resp, open(gz_path, "wb") as f:
        shutil.copyfileobj(resp, f)
    with gzip.open(gz_path, "rb") as src, open(json_path, "wb") as dst:
        shutil.copyfileobj(src, dst)
    return json_path


# ---------------------------------------------------------------------------
# silver: schema-enforced scan + normalization
# ---------------------------------------------------------------------------

def read_bronze(spark: SparkSession, path: str,
                multi_line: bool = False) -> DataFrame:
    """Schema-enforced JSON scan — no inference pass (reference
    load_data_task.py:117-121). Reads .json and .json.gz alike.
    ``multi_line=True`` for pretty-printed sample payloads (the reference's
    checked-in sample hour is ONE pretty-printed object, which its own
    line-mode reader cannot actually parse — a latent quirk; real GH
    Archive hours are JSON-lines and take the default path)."""
    return read_json_with_schema(spark, path, GH_EVENT_SCHEMA,
                                 timestamp_ntz_format=CREATED_AT_FORMAT,
                                 multi_line=multi_line)


def to_silver(bronze: DataFrame) -> DataFrame:
    """Normalize: drop the raw-JSON escape hatches (payload/other, reference
    load_data_task.py:129-130), parse created_at, add the date partition
    column."""
    return (
        bronze.drop("payload", "other")
        .withColumn("created_at",
                    F.to_timestamp_ntz("created_at", F.lit(CREATED_AT_FORMAT)))
        .withColumn("event_date", F.to_date("created_at"))
    )


def write_silver(silver: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned lake write. partitionBy(event_date) realizes the
    reference's per-date folder naming (load_data_task.py:135-145) as real
    partition pruning; maxRecordsPerFile caps file size at scale."""
    (silver.write.mode(mode)
     .option("maxRecordsPerFile", 5_000_000)
     .partitionBy("event_date")
     .parquet(path))


# ---------------------------------------------------------------------------
# gold: dimensional projections (reference load_data_task.py:174-191)
# ---------------------------------------------------------------------------

def gold_users(silver: DataFrame) -> DataFrame:
    """users dim: distinct actors (reference :177)."""
    return silver.select("actor.*").distinct()


def gold_repos(silver: DataFrame) -> DataFrame:
    """repos dim: distinct repos (reference :178)."""
    return silver.select("repo.*").distinct()


def gold_organizations(silver: DataFrame) -> DataFrame:
    """organizations dim: distinct orgs minus all-null rows from org-less
    events (reference :190-191 uses na.drop on any-null)."""
    return silver.select("org.*").distinct().na.drop()


def gold_events(silver: DataFrame) -> DataFrame:
    """events fact: aliased projection (reference :179-189) PLUS key dedup
    keeping the earliest occurrence per event id — fixing the reference's
    re-run append-duplication defect (README.md:303) with one window pass."""
    projected = silver.select(
        F.col("actor.id").alias("actor_id"),
        F.col("org.id").alias("org_id"),
        F.col("id"),
        F.col("created_at"),
        F.col("type"),
        F.col("public"),
        F.col("repo.id").alias("repo_id"),
        F.col("repo.name").alias("repo_name"),
        F.col("repo.url").alias("repo_url"),
    )
    w = Window.partitionBy("id").orderBy("created_at", "actor_id")
    return (
        projected.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def build_gold(silver: DataFrame) -> dict[str, DataFrame]:
    return {
        "users": gold_users(silver),
        "repos": gold_repos(silver),
        "organizations": gold_organizations(silver),
        "events": gold_events(silver),
    }
