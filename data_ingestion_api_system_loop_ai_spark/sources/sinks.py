"""Sinks: partitioned / bucketed / sorted parquet writers.

The reference's only sink is an HTTP JSON response
(``ingestController.js:32,46-54``); the engine's sinks are lakehouse
layouts chosen for how the data will be READ:

- ``write_partitioned``: hive-style directory partitioning — equality /
  range predicates on the partition columns become partition PRUNING
  (directories never listed), the single highest-leverage layout choice
  at 100 TB. Partition by low-cardinality, always-filtered columns
  (date, tenant); never by high-cardinality keys (small-files problem).
- ``write_bucketed_table``: hash-bucketed (and optionally sorted) table
  — joins and aggregations on the bucket key read co-located buckets
  and skip the shuffle entirely (verified by ``tests/test_sinks.py``:
  the bucketed join plan has no Exchange).
- ``coalesced_for_write``: bounds output file count so a heavily
  parallel job does not write thousands of tiny files per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
) -> None:
    df.write.partitionBy(*partition_by).mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally per-bucket-sorted) managed
    table; readers joining/aggregating on the bucket key skip the
    shuffle (bucket-aware scan)."""
    w = df.write.bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.mode(mode).format("parquet").saveAsTable(table)


def coalesced_for_write(df: DataFrame, max_files: int) -> DataFrame:
    """Bound the number of output files (small-files control). Uses
    ``coalesce`` (narrow, no shuffle) — combine with AQE's coalescing
    for shuffle outputs."""
    return df.coalesce(max_files)


def write_training_shards(
    df: DataFrame,
    path: str,
    records_per_file: int,
    shuffle_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write evenly-sized parquet shards for a training data loader:
    every file holds at most ``records_per_file`` rows
    (``maxRecordsPerFile``), so loader workers get uniform work units
    regardless of upstream partition skew.

    ``shuffle_key`` additionally hash-repartitions on that column first
    — a deterministic corpus 'shuffle' that breaks source ordering
    (documents from one crawl/domain end up spread across shards, the
    property batch samplers want) without any RNG. Leave it None to
    keep the input order and pay no shuffle."""
    out = df.repartition(F.col(shuffle_key)) if shuffle_key else df
    (
        out.write.option("maxRecordsPerFile", records_per_file)
        .mode(mode)
        .parquet(path)
    )
