"""Versioned parquet lake with time-travel reads — the capability slice of
the reference's Delta usage (overwrite + read-back,
/root/reference/pipeline/airflow/dags/load_data_task.py:140-147) done
natively, since the sandbox has no delta jars (see COVERAGE.md S3): every
write lands in an immutable ``v=N`` directory and a tiny JSON manifest is
swapped atomically to publish it. Readers resolve the manifest (or an
explicit version) and read only that directory — writers never mutate
published data, so concurrent readers are consistent without locks.

This is the core MVCC idea Delta/Iceberg implement with transaction logs;
the manifest here is the single-writer simplification (the reference's
Airflow DAG is single-writer per table too). Retention: old versions stay
until ``vacuum`` drops them — time travel works for anything retained.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def current_version(path: str) -> int | None:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return int(json.load(f)["version"])


def write_version(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next version of the table and publish it
    atomically. Returns the new version number."""
    prev = current_version(path)
    version = 0 if prev is None else prev + 1
    os.makedirs(path, exist_ok=True)
    vdir = os.path.join(path, f"v={version}")
    df.write.mode("overwrite").parquet(vdir)
    fd, tmp = tempfile.mkstemp(dir=path, prefix=".manifest_")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, _manifest_path(path))  # atomic publish
    return version


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """Read the published version (default) or a specific one (time
    travel). Raises if the requested version was never written or was
    vacuumed."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published version at {path}")
    vdir = os.path.join(path, f"v={v}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} not present at {path}")
    return spark.read.parquet(vdir)


def list_versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(int(d.split("=", 1)[1]) for d in os.listdir(path)
                  if d.startswith("v="))


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (never the published
    one). Returns the versions removed."""
    versions = list_versions(path)
    cur = current_version(path)
    removable = [v for v in versions[:-keep_last] if v != cur]
    for v in removable:
        shutil.rmtree(os.path.join(path, f"v={v}"))
    return removable
