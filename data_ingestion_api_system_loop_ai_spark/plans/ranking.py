"""Scalable global-order plans.

A bare ``Window.orderBy(...)`` (no ``partitionBy``) is the canonical way
to express a total order in Spark SQL, but its physical plan moves every
row into ONE partition — correct at any size, serial at every size. The
reference engine has the same structural problem in miniature: its
single min-heap (``src/utils/priorityQueue.js:25-92``) is a serial
total-order resource. These helpers compute identical results with
two-phase distributed plans.

Design note: an earlier draft bucketed by ``spark_partition_id()`` after
``repartitionByRange`` — that is WRONG in a multi-subtree plan, because
the range sampler re-draws boundaries per physical instantiation, so the
offsets subtree can disagree with the main subtree. Buckets here are
always a deterministic FUNCTION OF THE ROW (a leading prefix of the sort
key, or a numeric key range), so every subtree sees the same bucketing
no matter how the physical plan shakes out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    bucket_keys: Sequence[str],
    order_keys: Sequence[str],
    rn_col: str = "rn",
) -> DataFrame:
    """Contiguous 1-based global row number in
    ``ORDER BY bucket_keys, order_keys`` — without a single-partition sort.

    Two phases, both parallel:

    1. local rank: ``row_number`` over ``partitionBy(bucket_keys)
       .orderBy(order_keys)`` — an ordinary parallel window (one hash
       shuffle on the bucket keys);
    2. bucket offsets: per-bucket counts (tiny — one row per distinct
       bucket) -> exclusive prefix sum in bucket order -> broadcast join.

    The only serial work is the prefix sum over the per-bucket counters,
    which is O(#buckets), not O(#rows). Choose ``bucket_keys`` as a
    leading prefix of the total order with enough distinct, reasonably
    balanced values to spread load (e.g. ``(priority_rank, created_at)``
    here: ~7k buckets over the TPC-H date domain); ``order_keys`` must
    total-order rows within a bucket (include a unique tie-breaker).
    """
    bucket_keys = list(bucket_keys)
    order_keys = list(order_keys)
    local_w = W.partitionBy(*bucket_keys).orderBy(*order_keys)
    local = df.withColumn("_lrn", F.row_number().over(local_w).cast("long"))
    offsets = (
        df.groupBy(*bucket_keys)
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    W.orderBy(*bucket_keys).rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("_cnt")
    )
    return (
        local.join(F.broadcast(offsets), bucket_keys)
        .withColumn(rn_col, F.col("_offset") + F.col("_lrn"))
        .drop("_lrn", "_offset")
    )


def grouped_row_number(
    df: DataFrame,
    group_keys: Sequence[str],
    bucket_keys: Sequence[str],
    order_keys: Sequence[str],
    rn_col: str = "rn",
) -> DataFrame:
    """Contiguous 1-based row number WITHIN each group, in
    ``ORDER BY bucket_keys, order_keys`` group-locally — without moving
    a whole group through one window partition (a group = a domain or
    tenant can be arbitrarily large at corpus scale; ``partitionBy
    (group)`` alone would serialize it).

    Same two-phase shape as ``global_row_number``: local rank over
    (group, bucket) — fine-grained parallel partitions — then a
    per-(group, bucket) count relation whose exclusive prefix sum runs
    in a window partitioned by GROUP over O(#buckets) rows, broadcast
    back. ``bucket_keys`` must be a leading prefix of the intended
    within-group order (e.g. the first byte of the hash you order by).
    """
    gk, bk, ok = list(group_keys), list(bucket_keys), list(order_keys)
    local_w = W.partitionBy(*gk, *bk).orderBy(*ok)
    local = df.withColumn("_lrn", F.row_number().over(local_w).cast("long"))
    offsets = (
        df.groupBy(*gk, *bk)
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    W.partitionBy(*gk)
                    .orderBy(*bk)
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("_cnt")
    )
    return (
        local.join(F.broadcast(offsets), gk + bk)
        .withColumn(rn_col, F.col("_offset") + F.col("_lrn"))
        .drop("_lrn", "_offset")
    )


def prefix_agg_over_buckets(
    df: DataFrame,
    order_key: str,
    value_col: str,
    out_col: str,
    agg: str = "max",
    bucket_width: int = 4096,
) -> DataFrame:
    """Exclusive running aggregate of ``value_col`` over the global order
    of a numeric ``order_key`` (``ROWS UNBOUNDED PRECEDING`` exclusive of
    the current row), computed in parallel.

    Buckets are ``order_key div bucket_width`` — contiguous key ranges,
    deterministic, no sampling pass. Within a bucket the running
    aggregate is an ordinary (parallel) window; across buckets the
    exclusive prefix of whole-bucket aggregates is a tiny broadcast
    join. Requires a roughly uniform numeric key (dense surrogate ids
    are ideal); ``agg`` must be associative (max/min/sum).
    """
    fn = getattr(F, agg)
    b = df.withColumn("_bkt", (F.col(order_key) / bucket_width).cast("long"))
    in_bucket = W.partitionBy("_bkt").orderBy(order_key).rowsBetween(
        W.unboundedPreceding, -1
    )
    bucket_aggs = (
        b.groupBy("_bkt")
        .agg(fn(value_col).alias("_bval"))
        .withColumn(
            "_prefix",
            fn("_bval").over(W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)),
        )
        .select("_bkt", "_prefix")
    )
    local = fn(value_col).over(in_bucket)
    combine = {
        "max": F.greatest,
        "min": F.least,
        "sum": lambda a, c: F.coalesce(a, F.lit(0)) + F.coalesce(c, F.lit(0)),
    }[agg]
    return (
        b.join(F.broadcast(bucket_aggs), "_bkt", "left")
        .withColumn("_local", local)
        .withColumn(
            out_col,
            F.when(
                F.col("_local").isNotNull() & F.col("_prefix").isNotNull(),
                combine(F.col("_local"), F.col("_prefix")),
            ).otherwise(F.coalesce("_local", "_prefix")),
        )
        .drop("_bkt", "_prefix", "_local")
    )


def broadcast_stats(df: DataFrame, *aggs: Column) -> DataFrame:
    """Attach whole-relation scalar aggregates to every row via a 1-row
    broadcast cross join (instead of an unpartitioned window, which
    funnels all rows into one partition to compute a constant)."""
    return df.crossJoin(F.broadcast(df.agg(*aggs)))
