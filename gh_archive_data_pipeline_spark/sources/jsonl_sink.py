"""Custom Python DataSource WRITER: atomic JSON-lines sink (Spark 4
DataSourceWriter / DataSourceArrowWriter surface).

Completes the custom-source story (reader: gharchive_source.py, streaming
reader: streaming/replay_source.py) with the write path: each executor task
serializes its partition to a temp JSON-lines file and returns a commit
message; the driver's commit() atomically publishes the run by writing a
manifest listing exactly the committed files — readers that honor the
manifest never observe a half-written run (the same commit-protocol shape
Delta/Iceberg formalize). abort() removes the orphaned temp files.

Usage: df.write.format("jsonl_audit").option("path", dir).mode(...).save()
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int) -> None:
        self.filename = filename
        self.n_rows = n_rows


class JsonlAuditDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool) -> "JsonlAuditWriter":
        return JsonlAuditWriter(self.options, schema, overwrite)


class JsonlAuditWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_audit sink requires option('path', ...)")
        self._fields = [f.name for f in schema.fields]
        self._overwrite = overwrite

    def write(self, iterator) -> JsonlCommit:
        # Executor-side: one uniquely-named part file per task; the file is
        # invisible to readers until commit() lists it in the manifest.
        os.makedirs(self._path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self._path, fname), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self._fields, row))) + "\n")
                n += 1
        return JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        manifest = {
            "files": sorted(m.filename for m in messages),
            "rows": sum(m.n_rows for m in messages),
        }
        tmp = os.path.join(self._path, "_manifest.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self._path, "_manifest.json"))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self._path, m.filename))
            except OSError:
                pass


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as fh:
        return json.load(fh)
