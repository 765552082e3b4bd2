"""Mergeable-sketch rollups (HyperLogLog via Apache DataSketches).

``q_approx_distinct`` (operators/relational.py) shows the one-shot
``approx_count_distinct``; this module shows the form that matters at
100 TB: MATERIALIZED per-partition sketches that MERGE. A continuously
ingesting pipeline cannot re-scan history to count distincts per
rollup — instead each maintenance pass stores one tiny HLL sketch per
(event_type, day) (a few KB each, ``hll_sketch_agg``), and any later
rollup — per type, per week, global — is ``hll_union_agg`` over the
stored sketches: O(partitions) work against KB-sized state instead of
O(corpus) re-aggregation. This is the lossless-merge property plain
``approx_count_distinct`` intermediates do not expose to the user.

No DuckDB oracle: the sketch binary is engine-specific (DataSketches
HLL_4), so correctness is pinned by direct tests instead — the merged
estimate must EQUAL the single-pass estimate on the same data (union
of same-lgK sketches is deterministic), and both must sit within HLL
error of the exact distinct count.

Scale notes: sketch build is one (type, day) shuffle with map-side
partial sketches (the aggregation buffer IS the sketch); the rollup
shuffles only KB-sized sketch rows. Skew-free: sketch size is constant
regardless of the group's cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

HLL_LGK = 12  # 2^12 registers ≈ 1.6% rse — the DataSketches default


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization pass: one HLL sketch of ``user_id`` per
    (event_type, day) — what an incremental maintenance job appends to
    a stats table alongside its row counts."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id", HLL_LGK).alias("user_sketch"),
        F.count("*").alias("n_events"),
    )


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56 — distinct users per event type, computed by MERGING the
    stored daily sketches (never re-reading events): the incremental
    rollup path. Returns (event_type, approx_users, n_events)."""
    daily = daily_user_sketches(spark, sf_dir)
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("user_sketch"))
            .cast("long")
            .alias("approx_users"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


def direct_user_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass estimate over the raw events — the reference point
    the merged rollup must reproduce exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", HLL_LGK))
            .cast("long")
            .alias("approx_users")
        )
        .orderBy("event_type")
    )
