"""Behavioral analytics over the ``events`` stream table: ordered
funnels and cohort retention — the two canonical event-sequence OLAP
shapes (every product-analytics engine ships them; the reference has no
analytics surface at all, SURVEY.md §2.2).

Both are staged AGGREGATIONS, not sequence scans:

- ``q_funnel`` computes each user's first qualifying timestamp per
  stage with ORDER CONSTRAINTS (stage k counts only events strictly
  after the user's stage-k-1 time) as successive conditional min-
  aggregates — per stage one map-side-combinable agg plus one shuffle
  join on ``user_id``, never a per-user sorted array in memory, so a
  user with millions of events costs the same as one with ten. The
  final rollup is a 1-row count.
- ``q_cohort_retention`` assigns each user to their first-activity
  week (one min-agg), joins activity back on ``user_id``, and counts
  distinct users per (cohort week, week offset) — the classic
  triangular retention matrix. Two shuffles total, both on user_id;
  the triangle is at most (weeks)^2 rows regardless of corpus size.

Timestamps stay NTZ-native (``date_trunc``/``timestampdiff``) — the
identical expressions run on both engines, so the oracles are exact.

Reference parity: none — BASELINE.json north-star tier (§2.2 "window /
sessionization" family, extending q_sessionize's session windows with
cross-session user journeys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel view -> click -> purchase: one row with
    the user count reaching each stage (a later stage requires an event
    STRICTLY AFTER the user's first qualifying event of the previous
    stage) and the stage-over-stage conversion rates.
    (Unregistered — 50-slot cap; driver-grade DuckDB parity in
    tests/test_unregistered_ops.py.)"""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1, n2, n3 = s1.count(), s2.count(), s3.count()
    # stage counts are three scalars; assembling the 1-row result from
    # them is driver-side arithmetic over aggregates, not data movement
    return spark.createDataFrame(
        [(n1, n2, n3)], "n_view long, n_view_click long, n_view_click_purchase long"
    ).select(
        "*",
        F.round(F.col("n_view_click") / F.col("n_view"), 6).alias("conv_click"),
        F.round(
            F.col("n_view_click_purchase") / F.col("n_view_click"), 6
        ).alias("conv_purchase"),
    )


FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT n_view, n_view_click, n_view_click_purchase,
       round(n_view_click / CAST(n_view AS DOUBLE), 6) AS conv_click,
       round(n_view_click_purchase / CAST(n_view_click AS DOUBLE), 6) AS conv_purchase
FROM (SELECT (SELECT count(*) FROM s1) AS n_view,
             (SELECT count(*) FROM s2) AS n_view_click,
             (SELECT count(*) FROM s3) AS n_view_click_purchase)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: (cohort_week, week_offset,
    n_users, retention) — users grouped by first-activity week, counted
    distinct in each later week they were active; retention is the
    fraction of the cohort's size. (Unregistered — 50-slot cap;
    driver-grade DuckDB parity.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.expr("timestampdiff(DAY, cohort_week, week)") / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    sizes = active.filter(F.col("week_offset") == 0).groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            F.round(F.col("n_users") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_ORACLE = """
WITH ev AS (
  -- DuckDB's date_trunc('week') yields DATE; Spark's yields TIMESTAMP.
  -- Cast so the cohort column compares byte-identically.
  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events
),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
),
active AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         CAST(date_diff('day', c.cohort_week, e.week) / 7 AS INTEGER) AS week_offset
  FROM ev e JOIN cohort c ON e.user_id = c.user_id
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM active
  WHERE week_offset = 0 GROUP BY cohort_week
)
SELECT a.cohort_week, a.week_offset, count(*) AS n_users,
       round(count(*) / CAST(any_value(s.cohort_size) AS DOUBLE), 6) AS retention
FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
GROUP BY a.cohort_week, a.week_offset
ORDER BY a.cohort_week, a.week_offset
"""


# ---------------------------------------------------------------------------
# Event transition matrix — the first-order Markov view of the events
# stream (the behavioral-analytics complement to the funnel's fixed
# stage order): for every ordered pair of event types, how often does
# the second IMMEDIATELY follow the first within a user's timeline,
# and with what conditional probability.
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, n, p): consecutive-event transition counts
    per ordered type pair across all users, with the row-normalized
    probability ``p = n / sum_n(from_type)`` (each user's last event
    has no successor and drops out). One lag window per user (parallel
    across users — a user's timeline fits a partition by the same
    argument as SCD2) + one map-side-combinable pair count; the
    normalizer joins back on from_type over a types^2-bounded relation.
    (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    row-stochastic invariant in tests/test_unregistered_ops.py.)"""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


EVENT_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, to_type, count(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT from_type, sum(n) AS tot FROM pairs GROUP BY from_type)
SELECT p.from_type, p.to_type, p.n, round(p.n * 1.0 / t.tot, 6) AS p
FROM pairs p JOIN totals t USING (from_type)
ORDER BY p.from_type, p.to_type
"""
