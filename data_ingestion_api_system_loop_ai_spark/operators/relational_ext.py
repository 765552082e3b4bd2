"""Extended relational battery: TPC-H classics adapted to the test
schema, a deterministic salted-join skew pattern, the analytic-function
battery (lag/lead/ntile/percent_rank/cume_dist), statistical aggregates,
exact percentiles, and GROUPING SETS.

The reference implements none of this (its only relational surface is a
dictionary lookup + an array rollup, SURVEY.md §2.2); these queries are
the north-star extension tier, each a plain Catalyst-optimizable
DataFrame/SQL program with an exact DuckDB oracle.

Scale notes (100 TB):
- The TPC-H shapes join facts on their natural keys — dims broadcast,
  fact-fact goes sort-merge under AQE, filters reach the parquet scan.
- ``q_join_salted`` shows the deterministic skew-salting pattern: the
  skewed probe side derives a salt from a value column, the build side
  is exploded across all salts, so one hot key spreads over N reducers;
  result identical to the plain join. (AQE's skew-join split handles
  sort-merge skew automatically; salting is the portable form that also
  works for hash aggregation.)
- Analytic windows partition by customer — parallel, no global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.loader import load_table

N_SALTS = 8


def _dec(col, scale: str = "decimal(25,6)"):
    return F.col(col).cast(scale) if isinstance(col, str) else col.cast(scale)


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, adapted): top-10 unshipped orders by
    revenue for the BUILDING segment. customer is broadcast-joined; the
    orders-lineitem join shuffles on orderkey; top-k is
    TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "_rev"
            )
        )
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            F.col("_rev").cast("double").alias("revenue"),
        )
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume, adapted): revenue per nation for
    ASIA in 1996 where customer and supplier share a nation. Dims
    (supplier/customer/nation/region) broadcast; one fact shuffle."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): single scan, every predicate
    pushed to parquet, one scalar aggregate — the canonical
    scan-efficiency probe."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect, adapted): share of 1996 revenue from
    PROMO-type parts — conditional aggregation over the lineitem-part
    join (part broadcasts; lineitem's shipdate filter pushes to the
    scan)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(25,6)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).alias("_promo"),
            F.sum(rev).alias("_total"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("_promo") / F.col("_total"), 6).alias(
                "promo_revenue_pct"
            ),
            F.col("_promo").cast("double").alias("promo_revenue"),
            F.col("_total").cast("double").alias("total_revenue"),
        )
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue, adapted): revenue lost
    to small orders — lineitems of one brand whose quantity is below
    20% of that part's average quantity — written as a CORRELATED
    SCALAR SUBQUERY in SQL, the one Catalyst feature the rest of the
    battery never touches (VERDICT r02 #8). Catalyst decorrelates the
    subquery into a per-partkey aggregate joined back on p_partkey
    (RewriteCorrelatedScalarSubquery), so the physical plan is two
    scans + one aggregate + one join, never a per-row re-scan — the
    nested-loop trap a naive engine falls into.

    Exactness: the 20%-of-average predicate compares SCALED LONGS —
    ``5 * round(l_quantity*100) < avg(round(l_quantity*100))`` — so
    both engines compute one double division of exact integer sums and
    the boundary cannot flip on summation order. (The synthetic part
    table has no p_container; the brand filter alone plays its role.)"""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql(
        """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(30,0))) AS DOUBLE)
             / 100 / 7.0, 6) AS avg_yearly,
       count(*) AS n_cheap_lines
FROM q17_lineitem, q17_part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND 5 * CAST(round(l_quantity * 100) AS BIGINT) < (
        SELECT avg(CAST(round(l2.l_quantity * 100) AS BIGINT))
        FROM q17_lineitem l2
        WHERE l2.l_partkey = p_partkey)
"""
    )


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic skew-salting: probe side (lineitem) derives
    ``salt = l_linenumber % N``, build side (orders) is exploded across
    all N salts, and the join key becomes (orderkey, salt) — a single
    hot orderkey now spreads over N reducers. Values identical to the
    plain equi-join (the oracle IS the plain join)."""
    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "_salt", (F.col("l_linenumber") % N_SALTS).cast("int")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))).alias("_salt"),
        )
    )
    return (
        l.join(o, [l["_salt"] == o["_salt"], l["l_orderkey"] == o["o_orderkey"]])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(_dec("l_quantity", "decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


def q_analytic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic battery per customer over order history: lag/lead,
    ntile(4), percent_rank, cume_dist, first/last value, plus the
    running-frame aggregates (B9: exact decimal running sum + row count
    over rowsBetween(unboundedPreceding, currentRow)) — one parallel
    window partitioned by customer; all three frames share the same
    partitioning and sort, so Catalyst evaluates them in a single
    Window exchange."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(frame).alias("first_order"),
        F.last("o_orderkey").over(frame).alias("last_order"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(running)
        .cast("double")
        .alias("running_spend"),
        F.count("*").over(running).alias("order_seq"),
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per returnflag: stddev/variance of
    quantity, correlation and population covariance of quantity vs
    extendedprice, and exact continuous percentiles (25/50/75) of
    quantity — single-pass JVM aggregates plus Spark's percentile
    aggregate (per-group sort, parallel across the 3 flag groups; the
    approximate t-digest ``percentile_approx`` is the
    billions-of-rows form)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25_qty"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75_qty"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (25/50/75) of order totalprice per
    priority — standalone API form; the percentile aggregate is
    hash-checked inside ``q_stats_agg`` (registry capped at 50) and
    this form has a direct parity test in
    ``tests/test_unregistered_ops.py``."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over (order year, priority): per-year,
    per-priority, and grand-total rows with grouping_id disambiguation
    (complements q_rollup_cube's rollup/cube forms)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS o_year,
               o_orderpriority,
               grouping_id(year(o_orderdate), o_orderpriority) AS gid,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
        """
    )


RELATIONAL_EXT_QUERIES = {
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q17": q_tpch_q17,
    "q_join_salted": q_join_salted,
    "q_analytic_funcs": q_analytic_funcs,
    "q_stats_agg": q_stats_agg,
    "q_grouping_sets": q_grouping_sets,
}

RELATIONAL_EXT_ORACLES = {
    "q_tpch_q3": """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) DESC, l_orderkey
LIMIT 10
""",
    "q_tpch_q5": """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
    "q_tpch_q6": """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    "q_tpch_q14": """
SELECT round(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                              ELSE CAST(0 AS DECIMAL(25,6)) END)
             / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 6)
         AS promo_revenue_pct,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                     ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-07-01'
""",
    "q_tpch_q17": """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(30,0))) AS DOUBLE)
             / 100 / 7.0, 6) AS avg_yearly,
       count(*) AS n_cheap_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND 5 * CAST(round(l_quantity * 100) AS BIGINT) < (
        SELECT avg(CAST(round(l2.l_quantity * 100) AS BIGINT))
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
""",
    "q_join_salted": """
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    "q_analytic_funcs": """
SELECT o_orderkey, o_custkey, o_orderdate,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(o_orderkey) OVER wf AS first_order,
       last_value(o_orderkey) OVER wf AS last_order,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wr AS DOUBLE) AS running_spend,
       count(*) OVER wr AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    "q_stats_agg": """
SELECT l_returnflag, count(*) AS n,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
       round(quantile_cont(l_quantity, 0.50), 4) AS p50_qty,
       round(quantile_cont(l_quantity, 0.75), 4) AS p75_qty
FROM lineitem GROUP BY l_returnflag
""",
    "q_grouping_sets": """
SELECT year(o_orderdate) AS o_year,
       o_orderpriority,
       grouping(year(o_orderdate)) * 2 + grouping(o_orderpriority) AS gid,
       count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
""",
}


# Round-6 rotation: q_tpch_q6's slot funds q_gap_fill. Its shape
# (pushed-down scan filter + unconditional aggregate) stays
# hash-checked inside the registered q_hash_agg (Q1) and q_tpch_q14
# (filtered conditional aggregate); the driver-grade DuckDB comparison
# is kept by tests/test_unregistered_ops.py.
# q_tpch_q6 evicted r6 (funded q_gap_fill); q_tpch_q14 evicted in the
# round-8 second rotation (funded q_doremi_weights) — its
# join+conditional-share shape stays hash-checked by the registered
# q_tpch_q3/q5/q17 joins and the when-conditional aggregates across the
# registry; both keep driver-grade parity tests in
# tests/test_unregistered_ops.py and stay benched via bench._EXTRA.
UNREGISTERED_RELATIONAL_EXT_QUERIES = {
    n: RELATIONAL_EXT_QUERIES.pop(n) for n in ("q_tpch_q6", "q_tpch_q14")
}
UNREGISTERED_RELATIONAL_EXT_ORACLES = {
    n: RELATIONAL_EXT_ORACLES.pop(n) for n in ("q_tpch_q6", "q_tpch_q14")
}


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted): for
    finished orders, count per supplier the SLOW lines (shipped >90
    days after the order date) in multi-supplier orders where EVERY
    other supplier shipped on time — a correlated EXISTS (another
    supplier participated) AND a correlated NOT EXISTS (no other
    supplier was slow), both referencing the outer row with an
    inequality (``l2.l_suppkey <> l1.l_suppkey``).

    This is the adversarial decorrelation case Q17's scalar subquery
    does not cover: Catalyst's RewritePredicateSubquery turns the pair
    into a LEFT SEMI and a LEFT ANTI join on (orderkey) with the
    suppkey inequality as join condition — set-at-a-time, never a
    per-row re-scan. (The synthetic lineitem has no receipt/commit
    dates; ship-lag over 90 days plays the "late" role. Registered in
    the round-4 rotation — hash-checked by the driver every round; the
    plan-shape assertion stays in tests/test_unregistered_ops.py.)"""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q21_lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q21_orders")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q21_supplier")
    return spark.sql(
        """
SELECT s_name, count(*) AS numwait
FROM q21_supplier, q21_lineitem l1, q21_orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL '90' DAY
  AND EXISTS (
        SELECT 1 FROM q21_lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM q21_lineitem l3, q21_orders o3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND o3.o_orderkey = l3.l_orderkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL '90' DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""
    )


TPCH_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3, orders o3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND o3.o_orderkey = l3.l_orderkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity, adapted): dormant
    high-balance customers — in a subset of market segments, with a
    balance above the average POSITIVE balance of that subset, and with
    no urgent-priority order — grouped by "country code". This is the
    third decorrelation shape in the battery: an UNCORRELATED scalar
    subquery (Q17's was correlated) that Catalyst evaluates once and
    injects as a literal into the scan filter, plus a NOT EXISTS that
    RewritePredicateSubquery turns into a LEFT ANTI join on custkey —
    never a per-row re-scan of orders.

    Adaptations to the synthetic schema: customer has no c_phone, so
    the country code is the last two digits of c_name (keeps the
    substring-extraction flavor); near-every customer has SOME order,
    so "never placed an order" becomes "never placed an URGENT order"
    (~12% selective — the raw Q22 anti-join would be degenerate here).
    Exactness: balances compare as SCALED LONGS and the output sum is a
    decimal accumulation, the Q17/Q1 trick, so no boundary can flip on
    summation order. (Unregistered: the registry is at its 50-slot
    cap; driver-grade DuckDB parity + plan assert in
    tests/test_unregistered_ops.py.)"""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q22_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q22_orders")
    return spark.sql(
        """
SELECT substring(c_name, length(c_name) - 1, 2) AS cntrycode,
       count(*) AS numcust,
       round(CAST(sum(CAST(round(c_acctbal * 100) AS DECIMAL(30,0))) AS DOUBLE)
             / 100, 2) AS totacctbal
FROM q22_customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD')
  AND CAST(round(c_acctbal * 100) AS BIGINT) > (
        SELECT avg(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        FROM q22_customer c2
        WHERE c2.c_acctbal > 0.0
          AND c2.c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD'))
  AND NOT EXISTS (
        SELECT 1 FROM q22_orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
ORDER BY cntrycode
"""
    )


TPCH_Q22_ORACLE = """
SELECT substring(c_name, length(c_name) - 1, 2) AS cntrycode,
       count(*) AS numcust,
       round(CAST(sum(CAST(round(c_acctbal * 100) AS DECIMAL(30,0))) AS DOUBLE)
             / 100, 2) AS totacctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD')
  AND CAST(round(c_acctbal * 100) AS BIGINT) > (
        SELECT avg(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        FROM customer c2
        WHERE c2.c_acctbal > 0.0
          AND c2.c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD'))
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
ORDER BY cntrycode
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    customers to their non-urgent orders, count per customer, then
    histogram the counts. The shape the rest of the battery never
    touches: an outer join whose NULL-preserved rows are load-bearing
    (customers with zero matching orders must survive as c_count = 0)
    feeding a second, reduced aggregation. Both aggregations shuffle on
    their own key (custkey then c_count) with map-side partial counts;
    the second key space is tiny (~max orders per customer), so the
    final shuffle is a few dozen rows per partition at any corpus
    size. (Unregistered: the registry is at its 50-slot cap;
    driver-grade DuckDB parity in tests/test_unregistered_ops.py.)"""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q13_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q13_orders")
    return spark.sql(
        """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM q13_customer LEFT OUTER JOIN q13_orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""
    )


TPCH_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the supplier(s) hitting the MAXIMUM — an argmax over a derived
    aggregate, expressed as the classic scalar subquery over a shared
    CTE. Catalyst evaluates the max ONCE (one extra reduction over the
    ~n_suppliers aggregate, not a per-row re-scan) and the revenue CTE
    is tiny after its groupBy, so the equality filter is a broadcast
    compare. Revenue accumulates as DECIMAL(25,6) of the double
    product — order-independent, so the max-equality cannot flip with
    partitioning (the Q3 idiom). (Unregistered: 50-slot cap;
    driver-grade DuckDB parity in tests/test_unregistered_ops.py.)"""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q15_lineitem")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q15_supplier")
    return spark.sql(
        """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS total_rev
  FROM q15_lineitem
  WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP_NTZ '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM q15_supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
"""
    )


TPCH_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
"""

# Orders whose total quantity exceeds this are "large" (p99 of the
# per-order sum is ~262 at sf0.01, so ~1% of orders qualify).
Q18_QTY_THRESHOLD = 250


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose summed quantity
    clears a threshold, found via IN over a GROUP BY ... HAVING
    subquery. The decorrelation shape Q17/Q21/Q22 don't cover: the IN
    list is itself an AGGREGATED relation, so Catalyst plans
    aggregate-then-LeftSemi on orderkey — the filter applies to ~1% of
    keys before the 3-way join fans out, instead of joining everything
    and filtering late. Quantities compare as scaled longs (the Q17
    boundary trick): no double-sum ordering can flip membership at the
    threshold. (Unregistered: 50-slot cap; driver-grade DuckDB parity
    + LeftSemi plan assert in tests/test_unregistered_ops.py.)"""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q18_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q18_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q18_lineitem")
    return spark.sql(
        f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(30,0))) AS DOUBLE) / 100
         AS sum_qty
FROM q18_customer, q18_orders, q18_lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM q18_lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > {Q18_QTY_THRESHOLD} * 100)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""
    )


TPCH_Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(30,0))) AS DOUBLE) / 100
         AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > {Q18_QTY_THRESHOLD} * 100)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking, adapted): orders in a
    half-year window with at least one late line (shipped >60 days
    after the order date — the synthetic lineitem has no
    commit/receipt dates), counted by priority. The plain correlated
    EXISTS: RewritePredicateSubquery plans a LEFT SEMI on orderkey with
    the lateness predicate as join condition, so lineitem is touched
    once, not once per order. The date-window filter sits on the
    orders SCAN (pushed down) before the join. (Unregistered: 50-slot
    cap; driver-grade DuckDB parity + LeftSemi plan assert.)"""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q4_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q4_lineitem")
    return spark.sql(
        """
SELECT o_orderpriority, count(*) AS order_count
FROM q4_orders
WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP_NTZ '1996-07-01 00:00:00'
  AND EXISTS (
        SELECT 1 FROM q4_lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
    )


TPCH_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion, adapted): suppliers who
    hold an outsized share of some part — a (supplier, part) pair
    carrying more than a sixth of that part's total shipped quantity
    (the half-share rule of the original is empty on this evenly
    spread synthetic data) — via an IN subquery whose
    body contains a CORRELATED SCALAR subquery (the per-part total).
    The composite decorrelation shape the battery lacked: Catalyst
    must decorrelate the scalar into an aggregate-join INSIDE the IN
    relation, then turn the IN into a LEFT SEMI — two rewrites
    stacked. Quantities compare as scaled longs and the half-threshold
    is the integer-exact ``6*q > total`` (no fractional double
    multiply to tie-break wrong). The synthetic schema has no partsupp; shipped
    lineitem quantities play the availqty role. (Unregistered: 50-slot
    cap; driver-grade DuckDB parity + plan assert.)"""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q20_supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q20_lineitem")
    return spark.sql(
        """
SELECT s_suppkey, s_name
FROM q20_supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM (SELECT l_suppkey, l_partkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS q
        FROM q20_lineitem GROUP BY l_suppkey, l_partkey) pair
  WHERE 6 * q > (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT))
                 FROM q20_lineitem l2
                 WHERE l2.l_partkey = pair.l_partkey))
ORDER BY s_suppkey
"""
    )


TPCH_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM (SELECT l_suppkey, l_partkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS q
        FROM lineitem GROUP BY l_suppkey, l_partkey) pair
  WHERE 6 * q > (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT))
                 FROM lineitem l2
                 WHERE l2.l_partkey = pair.l_partkey))
ORDER BY s_suppkey
"""

# Round-4 rotation: q_tpch_q21 enters the registry (slot funded by
# q_multimodal_meta, which keeps a driver-grade parity test in
# tests/test_unregistered_ops.py). Appended here because the function
# and its oracle are defined after the module's main dicts.
RELATIONAL_EXT_QUERIES["q_tpch_q21"] = q_tpch_q21
RELATIONAL_EXT_ORACLES["q_tpch_q21"] = TPCH_Q21_ORACLE


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping, adapted): revenue flowing between two
    specific nations in either direction, by supplier nation / customer
    nation / ship year. The shape: a five-way join where BOTH fact-side
    joins shuffle (lineitem⋈orders on orderkey) while every dim
    broadcasts, plus the symmetric nation-pair DISJUNCTION — Catalyst
    keeps the equi-keys (suppkey/custkey/nationkey) and evaluates the
    OR as a residual, never a nested-loop. Revenue is the exact decimal
    sum (Q1/Q3 idiom). (Unregistered — 50-slot cap; driver-grade
    DuckDB parity in tests/test_unregistered_ops.py.)"""
    n1, n2 = "NATION_1", "NATION_2"
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    na = load_table(spark, sf_dir, "nation")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    ns = F.broadcast(na.select(F.col("n_nationkey").alias("_snk"),
                               F.col("n_name").alias("supp_nation")))
    nc = F.broadcast(na.select(F.col("n_nationkey").alias("_cnk"),
                               F.col("n_name").alias("cust_nation")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(ns, F.col("s_nationkey") == F.col("_snk"))
        .join(nc, F.col("c_nationkey") == F.col("_cnk"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting, adapted): top-20 customers
    by revenue lost to returns (l_returnflag='R') in one quarter, with
    full customer detail. Wide GROUP BY over the fact join (customer
    and nation broadcast), top-k by TakeOrderedAndProject.
    (Unregistered — 50-slot cap; direct DuckDB parity.)"""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "_rev"
            )
        )
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


TPCH_Q10_ORACLE = """
SELECT c_custkey, c_name, CAST(rev AS DOUBLE) AS revenue, c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS rev
  FROM customer, orders, lineitem, nation
  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
    AND o_orderdate >= TIMESTAMP '1995-10-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
ORDER BY rev DESC, c_custkey
LIMIT 20
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, adapted): the disjunction-of-
    conjunctions join — three (brand, size-range, quantity-range)
    alternatives OR-ed together across the lineitem⋈part equi-join.
    The planner test: Catalyst must still extract p_partkey=l_partkey
    as the hash-join key (part broadcasts) and evaluate the OR as a
    residual condition — plan-asserted: no nested-loop join appears.
    (Unregistered — 50-slot cap; direct DuckDB parity.)"""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    alt = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), (l.l_partkey == p.p_partkey) & alt)
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


TPCH_Q19_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30))
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship, adapted): distinct
    supplier count per (brand, type, size) for a part subset, EXCLUDING
    a supplier denylist — the NOT IN subquery that
    RewritePredicateSubquery turns into a LEFT ANTI join, feeding a
    count(DISTINCT) aggregate (two-phase distinct expansion). The
    synthetic schema has no partsupp: the part↔supplier association is
    derived from lineitem, and the "complaints" denylist is suppliers
    whose name ends in '7'. (Unregistered — 50-slot cap; direct DuckDB
    parity + anti-join plan assert.)"""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("q16_part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q16_supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q16_lineitem")
    return spark.sql(
        """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM q16_part, q16_lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
        SELECT s_suppkey FROM q16_supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""
    )


TPCH_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier, adapted): for each small part,
    the supplier(s) selling it at the part's MINIMUM unit price — a
    correlated scalar MIN subquery whose equality predicate selects the
    argmin rows, the fourth decorrelation shape in the battery (Q17:
    correlated scalar avg; Q21: EXISTS pair; Q22: uncorrelated scalar).
    Catalyst rewrites it into a per-partkey min aggregate joined back
    on (partkey, unit_price). The synthetic schema has no partsupp /
    ps_supplycost: unit price l_extendedprice/l_quantity over lineitem
    plays the cost column; the division is the identical double
    expression on both engines, so the equality cannot diverge.
    (Unregistered — 50-slot cap; direct DuckDB parity.)"""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("q2_part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q2_supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q2_lineitem")
    return spark.sql(
        """
SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name,
       l_extendedprice / l_quantity AS unit_price
FROM q2_part, q2_lineitem l1, q2_supplier
WHERE p_partkey = l1.l_partkey AND s_suppkey = l1.l_suppkey
  AND p_size <= 3
  AND l_extendedprice / l_quantity = (
        SELECT min(l2.l_extendedprice / l2.l_quantity)
        FROM q2_lineitem l2
        WHERE l2.l_partkey = l1.l_partkey)
ORDER BY p_partkey, s_suppkey
"""
    )


TPCH_Q2_ORACLE = """
SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name,
       l_extendedprice / l_quantity AS unit_price
FROM part, lineitem l1, supplier
WHERE p_partkey = l1.l_partkey AND s_suppkey = l1.l_suppkey
  AND p_size <= 3
  AND l_extendedprice / l_quantity = (
        SELECT min(l2.l_extendedprice / l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey)
ORDER BY p_partkey, s_suppkey
"""

def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share, adapted): of all STANDARD-type
    part volume sold into ASIA-region customers over two years, the
    per-year share supplied from NATION_5 — the conditional-aggregate-
    over-a-six-way-join shape. Both fact joins (lineitem⋈orders on
    orderkey) shuffle; part, customer, supplier, nation, region all
    broadcast; the share is a ratio of two exact decimal sums, each
    cast to double BEFORE the divide so both engines run the identical
    double division. (Unregistered — 50-slot cap; direct DuckDB parity
    in tests/test_unregistered_ops.py.)"""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    ns = F.broadcast(
        na.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))
    )
    # customer-side nation restricted to the ASIA region up front, so
    # the region join never touches the fact side
    nc = F.broadcast(
        na.join(F.broadcast(r), na.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("_cnk")
        )
    )
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(nc, F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("_snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0).cast("decimal(25,6)")))
            .cast("double")
            .alias("_num"),
            F.sum(vol).cast("double").alias("_den"),
        )
        .select(
            "o_year",
            (F.col("_num") / F.col("_den")).alias("mkt_share"),
            F.col("_den").alias("total_volume"),
        )
        .orderBy("o_year")
    )


TPCH_Q8_ORACLE = """
SELECT o_year,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS mkt_share,
       CAST(den AS DOUBLE) AS total_volume
FROM (
  SELECT year(o_orderdate) AS o_year,
         sum(CASE WHEN n1.n_name = 'NATION_5'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                  ELSE CAST(0 AS DECIMAL(25,6)) END) AS num,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS den
  FROM part, lineitem, orders, customer, supplier,
       nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND l_suppkey = s_suppkey
    AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY year(o_orderdate)
)
ORDER BY o_year
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit, adapted): profit by supplier
    nation and order year over parts whose name contains 'widget'.
    The synthetic schema has no partsupp/ps_supplycost, so supply cost
    is the deterministic column expression 0.6 * p_retailprice — the
    join/aggregate shape (two fact shuffles, every dim broadcast, an
    arithmetic profit measure spanning columns of THREE tables) is what
    Q9 exercises, and that is preserved. Profit is summed as exact
    decimal, cast to double at the end. (Unregistered — 50-slot cap;
    direct DuckDB parity.)"""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(na.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


TPCH_Q9_ORACLE = """
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount)
              - 0.6 * p_retailprice * l_quantity AS DECIMAL(25,6)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification, adapted): per-part
    sold value restricted to suppliers of one nation, keeping only
    parts whose value exceeds a FRACTION OF THE GLOBAL TOTAL — the
    uncorrelated scalar subquery in HAVING. Catalyst plans the inner
    total as an independent subquery whose 1-row result broadcasts
    into the outer aggregate's filter; the big side is scanned twice
    (classic Q11 — the reuse is the exchange, not the scan). The
    synthetic schema has no partsupp: lineitem value
    l_extendedprice * l_quantity plays ps_supplycost * ps_availqty.
    (Unregistered — 50-slot cap; direct DuckDB parity + scalar-
    subquery plan assert.)"""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q11_supplier")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("q11_nation")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q11_lineitem")
    return spark.sql(
        """
SELECT l_partkey, CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS value
FROM q11_lineitem, q11_supplier, q11_nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY l_partkey
HAVING sum(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) > (
    SELECT sum(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) * 0.001
    FROM q11_lineitem, q11_supplier, q11_nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3')
ORDER BY value DESC, l_partkey
"""
    )


TPCH_Q11_ORACLE = """
SELECT l_partkey, CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY l_partkey
HAVING sum(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) > (
    SELECT sum(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) * 0.001
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3')
ORDER BY value DESC, l_partkey
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes & order priority, adapted): per ship
    mode, how many LATE lines belong to high- vs low-priority orders —
    the fact-fact shuffle join feeding two conditional counts. The
    synthetic lineitem has no l_shipmode/l_commitdate/l_receiptdate,
    so the mode is derived deterministically from l_linenumber
    (MAIL/SHIP/TRUCK by mod 3) and "late" is shipped more than 90 days
    after the order date — identical expressions on both engines. Only
    MAIL and SHIP qualify, and the mode filter applies BEFORE the join
    (pushed to the lineitem scan). (Unregistered — 50-slot cap; direct
    DuckDB parity.)"""
    o = load_table(spark, sf_dir, "orders")
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "MAIL")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("TRUCK")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("l_shipmode", mode)
        .filter(F.col("l_shipmode").isin("MAIL", "SHIP"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


TPCH_Q12_ORACLE = """
SELECT l_shipmode,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS low_line_count
FROM (
  SELECT l_orderkey, l_shipdate,
         CASE l_linenumber % 3 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
              ELSE 'TRUCK' END AS l_shipmode
  FROM lineitem
) l, orders
WHERE l_orderkey = o_orderkey
  AND l_shipmode IN ('MAIL', 'SHIP')
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_shipmode
ORDER BY l_shipmode
"""
