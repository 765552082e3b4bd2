"""Serving table: the reference's ``ingestionStore`` dict as a table.

The reference keeps request/batch state in a process-global JS object
(``ingestController.js:5``) — lost on restart, readable only in-process.
The engine's equivalent is a KEYED SERVING TABLE maintained by the
streaming layer and read by the status surface:

- ``ServingTable`` is a minimal versioned parquet table: every commit
  writes a new immutable ``v=<n>`` directory and then atomically swaps a
  pointer file (``os.replace``) — readers always see a complete version,
  never a half-written directory; a crash mid-commit leaves the previous
  version live. (The same commit protocol, scaled up, is what lakehouse
  table formats provide; on object storage the pointer swap maps to a
  conditional PUT.)
- ``upsert`` merges a micro-batch by key, keeping the row with the
  highest sequence per key. Micro-batch REPLAY (foreachBatch re-delivers
  after restart) is therefore idempotent: replayed rows lose the max-seq
  tie-break against themselves and nothing changes.
- ``attach_serving_sink`` wires a drain stream into the table via
  ``foreachBatch``.

Scale notes: the merge shuffles only on the key (one hash exchange of
micro-batch + current — both keyed, AQE-broadcast when the micro-batch
is small); versions are bounded by ``keep_versions`` vacuum.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

_POINTER = "_LATEST"


class ServingTable:
    """Keyed, versioned parquet serving table with atomic commits."""

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        seq_col: str,
        keep_versions: int = 3,
    ) -> None:
        self.path = path
        self.key_cols = list(key_cols)
        self.seq_col = seq_col
        self.keep_versions = keep_versions
        os.makedirs(path, exist_ok=True)

    # -- commit protocol ---------------------------------------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.path, _POINTER)

    def latest_version(self) -> int:
        try:
            with open(self._pointer_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _commit(self, version: int) -> None:
        tmp = self._pointer_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer_file())  # atomic pointer swap

    def _vacuum(self, current: int) -> None:
        floor = current - self.keep_versions
        for name in os.listdir(self.path):
            if name.startswith("v=") and int(name[2:]) < floor:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    # -- reads -------------------------------------------------------------

    def current(self, spark: SparkSession) -> DataFrame | None:
        v = self.latest_version()
        if v < 0:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v={v}"))

    def lookup(self, spark: SparkSession, **key_values) -> DataFrame | None:
        cur = self.current(spark)
        if cur is None:
            return None
        for k, val in key_values.items():
            cur = cur.filter(F.col(k) == F.lit(val))
        return cur

    # -- writes ------------------------------------------------------------

    def upsert(self, batch_df: DataFrame) -> int:
        """Merge a micro-batch: per key keep the highest-``seq_col`` row
        (new beats old; replayed rows tie with themselves — idempotent).
        Writes version N+1, swaps the pointer, vacuums old versions.
        Returns the committed version number."""
        spark = batch_df.sparkSession
        cur = self.current(spark)
        merged = batch_df if cur is None else cur.unionByName(batch_df)
        w = W.partitionBy(*self.key_cols).orderBy(F.col(self.seq_col).desc())
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        next_v = self.latest_version() + 1
        latest.write.mode("overwrite").parquet(
            os.path.join(self.path, f"v={next_v}")
        )
        self._commit(next_v)
        self._vacuum(next_v)
        return next_v


def attach_serving_sink(drain: DataFrame, table: ServingTable, checkpoint: str):
    """Run a (finite) drain stream into the serving table: one idempotent
    upsert per micro-batch, checkpointed so a restart resumes from the
    last committed batch. Empty micro-batches (triggers that drained
    nothing) commit no new version."""

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        if not batch_df.isEmpty():
            table.upsert(batch_df)

    return (
        drain.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
