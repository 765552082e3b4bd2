"""Table maintenance: small-file compaction and sort-for-skipping.

A continuously-ingesting pipeline (the reference accepts requests one
POST at a time; the streaming layer lands one micro-batch of files per
trigger) accumulates many small files — the classic lakehouse failure
mode at 100 TB: every query pays per-file open/footer costs and the
scheduler drowns in splits. These helpers are the batch maintenance
pass a production deployment runs behind the live writer:

- ``compact_parquet``: bin-packs a parquet dataset (optionally
  per hive partition) into files of ``target_file_bytes``, sized from
  the ACTUAL on-disk bytes, not row counts — compression-aware.
- ``rewrite_sorted``: rewrites with an intra-partition sort so parquet
  writes tight min/max column statistics; point/range predicates on the
  sort key then skip whole row groups at scan time (the single-column
  cousin of Z-ordering).

Both are plain batch jobs over open formats — no table-format service
required; the same calls run against a partitioned directory on object
storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dataset_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_target_files(path: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES) -> int:
    """Number of output files that bin-packs the dataset's on-disk bytes
    into ``target_file_bytes`` chunks (>= 1). Driven by real file sizes
    so compressed column data, not row counts, decides the layout."""
    return max(1, -(-_dataset_bytes(path) // target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: str | None = None,
) -> int:
    """Rewrite ``src`` (a parquet dataset, possibly thousands of small
    files) into ``dst`` with file count chosen from on-disk size.
    Returns the target file count.

    Unpartitioned: one ``repartition(n)`` — a full shuffle, but the
    maintenance job is the one place that shuffle is the *point* (it is
    what redistributes many tiny files into even large ones).
    Partitioned: ``repartition(n, partition_col)`` + ``partitionBy``
    keeps each hive partition's rows together so the rewrite preserves
    partition pruning; files per partition stay bounded by n.
    """
    df = spark.read.parquet(src)
    n = plan_target_files(src, target_file_bytes)
    if partition_by:
        (
            df.repartition(n, F.col(partition_by))
            .write.partitionBy(partition_by)
            .mode("overwrite")
            .parquet(dst)
        )
    else:
        df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def rewrite_sorted(
    spark: SparkSession,
    src: str,
    dst: str,
    sort_cols: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Compact AND cluster: range-partition by the sort key(s) then sort
    within each output file, so parquet min/max statistics on the sort
    columns are tight and disjoint across files — a scan with a
    predicate on the leading sort column reads only the files (and row
    groups) whose range overlaps. Returns the file count."""
    df = spark.read.parquet(src)
    n = plan_target_files(src, target_file_bytes)
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(dst)
    )
    return n


def parquet_files(path: str) -> list[str]:
    """Data files of a parquet dataset (recursive, metadata excluded)."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def file_column_ranges(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Per-file min/max of ``col`` — the footer statistics a skipping
    scan consults, recomputed as a DataFrame for tests/inspection."""
    return (
        spark.read.parquet(path)
        .select(F.col(col), F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.min(col).alias("min_v"), F.max(col).alias("max_v"))
    )
