"""Tier-B relational operator battery (SURVEY.md section 2.3, B1-B12).

The reference has no joins/aggregations/windows (SURVEY.md section 2.2 —
its only lookup is a dict probe, ``ingestService.js:128-131``); this
module supplies the relational surface a user of a real analytics engine
needs, each op as the idiomatic Catalyst-optimizable DataFrame program.

Determinism-for-oracle conventions (SURVEY.md section 7 risk 5):
- double aggregates are summed as DECIMAL (order-independent exact
  arithmetic) and emitted as DOUBLE;
- every computed column is aliased identically in Spark and oracle SQL;
- ties in rankings/top-k are broken by unique keys.

Scale notes: dimension joins broadcast (region/nation/customer are tiny
relative to facts); fact-fact joins shuffle on their keys and rely on
AQE for skew; aggregations are partial+final (map-side combine) by
construction; scans push filters and prune columns — see
``plans/explain.py`` to audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.loader import load_table


def _dsum(col, scale_type="decimal(25,6)"):
    """Order-independent sum of a double expression: per-row cast to
    decimal (deterministic), exact decimal sum, emitted as double."""
    return F.sum(col.cast(scale_type)).cast("double")


# --- B1: scan + filter + projection (pushdown-audited) ----------------------


def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with predicate + projection; Catalyst pushes both to
    the scan (PushedFilters/ReadSchema — TPC-H Q6 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")


# --- B2: broadcast dim join --------------------------------------------------


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer x nation x region with explicit broadcast of the dims —
    no shuffle of the fact side at all."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            _dsum(F.col("c_acctbal"), "decimal(18,2)").alias("sum_acctbal"),
        )
    )


# --- B3: large-large shuffle join -------------------------------------------


def q_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders x lineitem equi-join (both sides shuffle on the key; AQE
    picks sort-merge vs shuffled-hash and handles skew)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# --- B4: semi / anti joins ----------------------------------------------------


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders (left_semi = EXISTS) and without
    (left_anti = NOT EXISTS), tagged and unioned."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    with_orders = c.join(o, "c_custkey", "left_semi").withColumn(
        "has_orders", F.lit(True)
    )
    without = c.join(o, "c_custkey", "left_anti").withColumn(
        "has_orders", F.lit(False)
    )
    return with_orders.unionByName(without)


# --- B5: hash aggregation (TPC-H Q1 shape) -----------------------------------


def q_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Q1 aggregate battery — partial aggregation map-side, final
    after a tiny 6-group shuffle.

    Sums run on EXACT SCALED-LONG per-row values (quantity/price/
    discount/tax all carry <= 2 decimal digits, so ``round(x*100)`` is
    the exact integer form; products stay exact in a long: charge is
    scaled 1e6, < 2.4e11 per row). The per-row work is then pure codegen
    integer math instead of BigDecimal multiplies — a measured ~5%
    faster than the decimal-cast formulation in an isolated alternating
    A/B at sf0.1 (medians 1.29 s vs 1.36 s over 7 runs; the r02 bench's
    4.3 s median did not reproduce in isolation, so that regression was
    bench-cycle GC/context noise, not this plan) — while the
    accumulator stays DECIMAL, so group sums cannot overflow at any
    corpus size. Emitted values are bit-identical to the
    decimal-cast formulation (the double product's error, ~1e-11
    relative, vanishes at the 4/6-decimal cast the oracle applies), so
    the DuckDB oracle is unchanged."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2000-12-01"
    )
    q2 = F.round(F.col("l_quantity") * 100).cast("long")
    p2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d2 = F.round(F.col("l_discount") * 100).cast("long")
    t2 = F.round(F.col("l_tax") * 100).cast("long")
    disc4 = p2 * (100 - d2)  # price*(1-disc), scaled 1e4, exact
    charge6 = disc4 * (100 + t2)  # ... *(1+tax), scaled 1e6, exact
    n = F.count("*")

    def dsum(col, scale: int):
        return (F.sum(col.cast("decimal(30,0)")) / F.lit(10**scale)).cast("double")

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(q2, 2).alias("sum_qty"),
        dsum(p2, 2).alias("sum_base_price"),
        dsum(disc4, 4).alias("sum_disc_price"),
        dsum(charge6, 6).alias("sum_charge"),
        F.round(dsum(q2, 2) / n, 6).alias("avg_qty"),
        F.round(dsum(p2, 2) / n, 6).alias("avg_price"),
        F.round(dsum(d2, 2) / n, 6).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    )


# --- B6: distinct aggregation -------------------------------------------------


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (the approx_count_distinct scale
    variant lives beside it — rows-only, see q_approx_distinct)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        _dsum(F.col("value"), "decimal(18,6)").alias("sum_value"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path where exact distinct
    would shuffle every key. Approximation is engine-specific, so this
    has no oracle; it is exercised by a direct accuracy test
    (``tests/test_unregistered_ops.py``) rather than a registry slot —
    the driver caps CORRECTNESS at 50 entries and oracle-checkable
    queries take priority."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


# --- B7: grouping sets / cube -------------------------------------------------


def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (order year, priority) — all four grouping sets in one
    pass (Catalyst expands then aggregates once)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    return o.cube("o_year", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        _dsum(F.col("o_totalprice"), "decimal(18,2)").alias("sum_price"),
    )


# --- B8: window ranking (top-N per group) -------------------------------------


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (row_number with a unique
    tie-break so results are exact across engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


# --- B9: running window aggregate ---------------------------------------------


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date — frame
    rowsBetween(unboundedPreceding, currentRow); decimal accumulation so
    the running value is exact. The same running-frame columns are
    hash-checked inside ``q_analytic_funcs`` (registry capped at 50);
    this standalone form stays as API surface with a direct parity test."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count("*").over(w).alias("order_seq"),
    )


# --- B10: global top-k ----------------------------------------------------------


def q_topk_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 lineitems by extendedprice — TakeOrderedAndProject:
    per-partition top-k then a k-row merge on the driver, never a full
    sort of the table."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
    )


# --- B11: set operations ---------------------------------------------------------


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two customer cohorts (ordered in
    1995 vs 1996), tagged into one relation."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    b = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    return (
        a.union(b).distinct().withColumn("op", F.lit("union"))
        .unionByName(a.intersect(b).withColumn("op", F.lit("intersect")))
        .unionByName(a.exceptAll(b).withColumn("op", F.lit("except")))
    )


# --- B12: scalar function battery -------------------------------------------------


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math/array/JSON scalar functions in one projection —
    all JVM-side built-ins, whole-stage-codegen'd, zero Python."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_pfx"),
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("type_user"),
        F.length("event_type").alias("type_len"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("ts_day"),
        F.year("ts").alias("ts_year"),
        F.month("ts").alias("ts_month"),
        F.round(F.col("value"), 2).alias("value_round"),
        F.abs(F.col("value") - 50).alias("value_centered"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), 1 + F.col("user_id") % 5),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("seq_str"),
    )


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path via the Spark 4 VARIANT type: ``parse_json``
    decodes ``events.props`` ONCE into the binary variant encoding, and
    every extraction after that is a typed ``variant_get`` path lookup
    on the decoded form — at N extractions per row this beats
    ``get_json_object`` (q_scalar_funcs' form), which re-parses the
    JSON string per call. Shape here: parse -> typed extract -> grouped
    aggregate, all JVM-side. (Unregistered — 50-slot cap; driver-grade
    DuckDB parity via json_extract in tests/test_unregistered_ops.py.)"""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json(F.col("props"))
    )
    k = F.expr("variant_get(v, '$.k', 'long')")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.countDistinct(k).alias("n_distinct_k"),
    )


VARIANT_PROPS_ORACLE = """
SELECT event_type, count(*) AS n_events,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
         AS n_distinct_k
FROM events GROUP BY event_type
"""


RELATIONAL_QUERIES = {
    "q_scan_filter_project": q_scan_filter_project,
    "q_join_broadcast": q_join_broadcast,
    "q_join_shuffle": q_join_shuffle,
    "q_join_semi_anti": q_join_semi_anti,
    "q_hash_agg": q_hash_agg,
    "q_distinct_agg": q_distinct_agg,
    "q_rollup_cube": q_rollup_cube,
    "q_window_rank": q_window_rank,
    "q_topk_sort_limit": q_topk_sort_limit,
    "q_set_ops": q_set_ops,
    "q_scalar_funcs": q_scalar_funcs,
}

RELATIONAL_ORACLES = {
    "q_scan_filter_project": """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
""",
    "q_join_broadcast": """
SELECT r_name, n_name, count(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    "q_join_shuffle": """
SELECT o_orderkey, o_orderdate, o_orderpriority, count(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderdate, o_orderpriority
""",
    "q_join_semi_anti": """
SELECT c_custkey, c_name, TRUE AS has_orders FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, c_name, FALSE AS has_orders FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    "q_hash_agg": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
    "q_distinct_agg": """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
    "q_rollup_cube": """
SELECT year(o_orderdate) AS o_year, o_orderpriority, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (year(o_orderdate), o_orderpriority)
""",
    "q_window_rank": """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
    "q_topk_sort_limit": """
SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
""",
    "q_set_ops": """
WITH a AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1995),
     b AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT c_custkey, 'union' AS op FROM (SELECT * FROM a UNION SELECT * FROM b)
UNION ALL
SELECT c_custkey, 'intersect' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT c_custkey, 'except' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
""",
    "q_scalar_funcs": """
SELECT event_id,
       upper(event_type) AS type_upper,
       substring(event_type, 1, 3) AS type_pfx,
       event_type || ':' || CAST(user_id AS VARCHAR) AS type_user,
       CAST(length(event_type) AS INTEGER) AS type_len,
       CAST(date_trunc('day', ts) AS DATE) AS ts_day,
       CAST(year(ts) AS INTEGER) AS ts_year,
       CAST(month(ts) AS INTEGER) AS ts_month,
       round(value, 2) AS value_round,
       abs(value - 50) AS value_centered,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
       array_to_string(list_transform(range(1, 1 + user_id % 5 + 1), x -> CAST(x AS VARCHAR)), '|') AS seq_str
FROM events
""",
}


# Evicted from the driver's 50-slot registry to fund the LLM-pipeline
# quartet (decontamination / quality filter / domain mix / corpus
# shuffle). Still full API surface and still oracle-EXACT: the same
# Spark-vs-DuckDB comparison the driver runs is pinned by
# tests/test_unregistered_ops.py over these dicts.
UNREGISTERED_RELATIONAL_QUERIES = {
    n: RELATIONAL_QUERIES.pop(n)
    # q_window_rank joined in the round-5 rotation (funding q_knn_graph
    # et al.): its dense_rank-over-partition shape is subsumed by the
    # registered q_analytic_funcs battery, and the parity test below
    # keeps the driver-grade comparison.
    # q_join_shuffle / q_rollup_cube joined in the round-6 rotation
    # (funding q_ks_drift / q_scd2): shuffle-join semantics stay
    # hash-checked inside the registered q_tpch_q3/q5/q21 and
    # q_join_salted; CUBE is a special case of the registered
    # q_grouping_sets. Both keep the driver-grade comparison in
    # tests/test_unregistered_ops.py.
    for n in (
        "q_topk_sort_limit",
        "q_set_ops",
        "q_scalar_funcs",
        "q_window_rank",
        "q_join_shuffle",
        "q_rollup_cube",
    )
}
UNREGISTERED_RELATIONAL_ORACLES = {
    n: RELATIONAL_ORACLES.pop(n)
    for n in (
        "q_topk_sort_limit",
        "q_set_ops",
        "q_scalar_funcs",
        "q_window_rank",
        "q_join_shuffle",
        "q_rollup_cube",
    )
}
