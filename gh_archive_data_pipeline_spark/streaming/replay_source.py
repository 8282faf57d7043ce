"""Custom Python STREAMING DataSource: deterministic replay of a parquet
event table as a stream (Spark 4 SimpleDataSourceStreamReader).

The reference simulated a live feed with a Kafka producer emitting one
message per 10 s (produce_fake_data.py:132) — load-bearing infrastructure
for demos, useless for tests. This source replays a fixture table
``rows_per_batch`` rows per micro-batch with exactly-once offset tracking,
so streaming operators can be exercised against a REAL source-offset
lifecycle (initialOffset → read → commit) without Kafka, and the content
is byte-deterministic.

The Simple reader runs on the driver and is meant for low-volume sources
(its data is shipped to executors through the offset log); the
partition-parallel DataSourceStreamReader is the scale variant — same
offset contract, executor-side reads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

REPLAY_DDL = "event_id long, user_id long, event_type string, value double"


class ReplayDataSource(DataSource):
    """`spark.readStream.format("replay").option("path", f.parquet)`."""

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self) -> str:
        return REPLAY_DDL

    def simpleStreamReader(self, schema) -> "ReplayStreamReader":
        return ReplayStreamReader(self.options)


class ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self._path = options.get("path")
        if not self._path or not os.path.exists(self._path):
            raise ValueError(f"replay source: bad path {self._path!r}")
        self._batch = int(options.get("rows_per_batch", "1000"))
        self._rows: list[tuple] | None = None

    def _load(self) -> list[tuple]:
        if self._rows is None:
            import pyarrow.parquet as pq

            t = pq.read_table(self._path,
                              columns=["event_id", "user_id",
                                       "event_type", "value"])
            cols = [t.column(c).to_pylist()
                    for c in ("event_id", "user_id", "event_type", "value")]
            self._rows = list(zip(*cols))
        return self._rows

    # -- offset lifecycle ---------------------------------------------------
    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = start["pos"]
        hi = min(lo + self._batch, len(rows))
        return iter(rows[lo:hi]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay after failure: deterministic slice ⇒ exactly-once
        rows = self._load()
        return iter(rows[start["pos"]:end["pos"]])

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    spark.dataSource.register(ReplayDataSource)
