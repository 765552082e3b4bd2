"""Custom Python data source for the reference's ingest wire format.

The reference's input is JSON request bodies over HTTP
(``ingestRoutes.js:6``: ``POST /ingest`` with ``{ids, priority}``).
Batch and streaming readers elsewhere parse captured JSONL with
``from_json``/``read.json``; this module exposes the same wire format
as a FIRST-CLASS Spark connector via the Spark 4 Python Data Source
API (``pyspark.sql.datasource``):

    spark.dataSource.register(IngestWireDataSource)
    spark.read.format("ingestwire").load("capture_dir/")

Why a custom source at all, when ``read.json`` exists: the connector
is where format-specific policy lives — the fixed wire schema (no
inference pass over the data), per-file input partitions (each capture
file reads in parallel on its own executor task, the natural unit for
an HTTP-capture directory), and strict per-line decoding that
attributes errors to file and line. The Python Data Source API is the
slow path relative to the JVM JSON reader (rows cross Arrow per
batch) — the right tool for bespoke formats and side systems, which is
exactly what it demonstrates here; the hot ingest path keeps the
native reader (``requests_json_stream``/``kafka_requests_stream``,
``streaming/live.py``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# the POST /ingest body plus capture metadata; matches
# schemas.REQUEST_WIRE_SCHEMA's field names
WIRE_SCHEMA = (
    "request_id string, priority string, created_at_ms long, ids array<int>"
)


class _WireFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class IngestWireReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ingestwire requires a path")

    def partitions(self):
        """One input partition per capture file — files are the wire
        format's natural parallelism unit (one HTTP capture shard
        each); a directory of N files fans out to N executor tasks."""
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self.path]
        return [_WireFilePartition(f) for f in files]

    def read(self, partition):
        """Executor-side: strict per-line JSON decode; a malformed line
        fails the task with the file and line number (the reference
        400s a malformed body — a batch capture replay wants the
        position, not a silent null row)."""
        with open(partition.path) as f:
            for lineno, line in enumerate(f, 1):
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError as exc:
                    raise ValueError(
                        f"{partition.path}:{lineno}: malformed wire line"
                    ) from exc
                yield (
                    str(r["request_id"]) if "request_id" in r else None,
                    r.get("priority"),
                    r.get("created_at_ms"),
                    list(r["ids"]) if r.get("ids") is not None else None,
                )


class IngestWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ingestwire"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def reader(self, schema) -> IngestWireReader:
        return IngestWireReader(self.options)
