"""Z-order data layout + data-skipping audit — B127.

At 100 TB the scan you AVOID is the cheapest operator there is: files
carry per-column min/max footers, and a point/range predicate skips
every file whose span excludes it. A single-column sort gives perfect
skipping on that column and NONE on any other; Morton/Z-ORDER
interleaving (the Delta Lake / Iceberg `OPTIMIZE ZORDER BY` recipe)
buys balanced skipping on several columns at once by sorting on the
bit-interleave of the bucketed dimensions.

This operator lays out lineitem by both strategies and MEASURES the
trade instead of asserting it: per (layout, file) it emits the
min/max span of each dimension — the expected fraction of files a
uniform point query must scan IS the average normalized span, so the
output is the data-skipping story in one relation. The expected
shape (pinned by the direct test): linear layout -> partkey span ~0,
suppkey span ~1 (sorted column skips, the other reads everything);
z-order -> BOTH spans around sqrt-law middle ground, i.e. two-digit
percent skipping on two dimensions simultaneously.

Spark shape, and why it holds at 100 TB:

- bucketing and the Morton code are pure integer arithmetic on two
  broadcast scalars (the dims' min/max — one tiny agg crossJoined
  in, the pagerank idiom); the bit interleave is spelled
  floor-div/mod/multiply-by-power-of-two (no engine-specific shift
  operators), generated once and shared VERBATIM with the oracle;
- the total order is the repo's two-phase ``global_row_number``
  (bucket by the z-value's high byte -> parallel local ranks ->
  O(#buckets) offset prefix sum), never a single-partition window —
  at cluster scale this is exactly ``repartitionByRange`` + local
  sort, which is how a real OPTIMIZE job writes the files;
- file assignment is ``floor((rn-1)*F/n)`` — equal-count files from
  the rank and the broadcast row count, no ntile window.

DuckDB oracle: same bucket/Morton/file arithmetic verbatim; the
global rank is a plain window there (the oracle may be serial — the
ENGINE may not).

Reference parity: none; BASELINE.json north-star tier ("storage
layout" at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lifecycle import local_checkpoint_handle
from ..plans.ranking import global_row_number
from ..sources.loader import load_table

ZBITS = 8          # buckets per dimension (256) -> 16-bit Morton code
N_FILES = 64

# bucket: v in [mn, mx] -> integer cell 0..2^ZBITS-1. floor over a
# double division is exact here (products < 2^29 << 2^53).
BUCKET_SQL = (
    "CAST(floor((({v}) - ({mn})) * {n} / (({mx}) - ({mn}) + 1)) AS BIGINT)"
)

# Morton interleave of the b1/b2 bucket columns: bit k of b1 lands at
# position 2k+1, bit k of b2 at 2k. floor-div/mod/multiply only — the
# arithmetic subset Spark SQL and DuckDB evaluate identically.
ZVALUE_SQL = " + ".join(
    f"((CAST(floor(b1 / {1 << k}) AS BIGINT) % 2) * {1 << (2 * k + 1)}"
    f" + (CAST(floor(b2 / {1 << k}) AS BIGINT) % 2) * {1 << (2 * k)})"
    for k in range(ZBITS)
)


def zorder_layout_audit(li: DataFrame, return_release: bool = False):
    """(layout, file_id, n_rows, min_partkey, max_partkey, min_suppkey,
    max_suppkey, span_partkey, span_suppkey) for the 'linear' (sort by
    partkey) and 'zorder' (sort by Morton code) layouts of ``li``.

    The returned plan rides an internal ``localCheckpoint`` of the
    bucket+Morton relation (the r13 stage boundary — four subtree
    instantiations collapsed to one). With ``return_release=True`` a
    second element exposes that checkpoint's release closure (the
    ``nn_descent`` convention — plans/lifecycle.py): call it once the
    returned relation has been materialized and no longer needs to be
    recomputed. The default leaves the blocks to the caller's harness
    sweep (bench.py releases between timed windows), same as the
    funnel-stage checkpoints — note a released checkpoint CANNOT be
    recomputed, so releasing and then re-materializing the returned
    DataFrame fails."""
    stats = F.broadcast(
        li.agg(
            F.min("l_partkey").alias("_mnp"),
            F.max("l_partkey").alias("_mxp"),
            F.min("l_suppkey").alias("_mns"),
            F.max("l_suppkey").alias("_mxs"),
            F.count("*").alias("_n"),
        )
    )
    n_cells = 1 << ZBITS
    based = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    ).crossJoin(stats)
    bucketed = based.select(
        "*",
        F.expr(
            BUCKET_SQL.format(v="l_partkey", mn="_mnp", mx="_mxp", n=n_cells)
        ).alias("b1"),
        F.expr(
            BUCKET_SQL.format(v="l_suppkey", mn="_mns", mx="_mxs", n=n_cells)
        ).alias("b2"),
        # STAGE BOUNDARY (r13): both layouts' two-phase ranks reference
        # this relation twice each (local rank + bucket offsets), so the
        # scan + bucket arithmetic + 16-term Morton interleave ran FOUR
        # times per audit (measured sf0.1: 1.4 s/instantiation of an
        # 11 s query). One lazy localCheckpoint materializes it once —
        # the same boundary funnel_stages places before its layout tail.
        # r14 (VERDICT r13 #8): routed through local_checkpoint_handle
        # so the blocks have an owner — see the docstring.
    ).withColumn("z", F.expr(ZVALUE_SQL))
    bucketed, release = local_checkpoint_handle(bucketed, eager=False)

    def files(df: DataFrame, layout: str, bucket_col, order_cols) -> DataFrame:
        ranked = global_row_number(
            df.withColumn("_bkt", bucket_col),
            bucket_keys=["_bkt"],
            order_keys=order_cols,
        )
        file_id = F.expr(f"CAST(floor((rn - 1) * {N_FILES} / _n) AS BIGINT)")
        per_file = (
            ranked.withColumn("file_id", file_id)
            .groupBy("file_id")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.min("l_partkey").alias("min_partkey"),
                F.max("l_partkey").alias("max_partkey"),
                F.min("l_suppkey").alias("min_suppkey"),
                F.max("l_suppkey").alias("max_suppkey"),
                F.first("_mnp").alias("_mnp"),
                F.first("_mxp").alias("_mxp"),
                F.first("_mns").alias("_mns"),
                F.first("_mxs").alias("_mxs"),
            )
        )
        return per_file.select(
            F.lit(layout).alias("layout"),
            "file_id",
            "n_rows",
            "min_partkey",
            "max_partkey",
            "min_suppkey",
            "max_suppkey",
            F.round(
                (F.col("max_partkey") - F.col("min_partkey") + 1)
                / (F.col("_mxp") - F.col("_mnp") + 1),
                6,
            ).alias("span_partkey"),
            F.round(
                (F.col("max_suppkey") - F.col("min_suppkey") + 1)
                / (F.col("_mxs") - F.col("_mns") + 1),
                6,
            ).alias("span_suppkey"),
        )

    linear = files(
        bucketed,
        "linear",
        # bucket by a partkey prefix: deterministic function of the row
        (F.col("b1")).cast("long"),
        ["l_partkey", "l_orderkey", "l_linenumber"],
    )
    zorder = files(
        bucketed,
        "zorder",
        # bucket by the Morton code's high byte
        F.expr(f"CAST(floor(z / {n_cells}) AS BIGINT)"),
        ["z", "l_orderkey", "l_linenumber"],
    )
    out = linear.unionByName(zorder)
    if return_release:
        return out, release
    return out


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file min/max spans of the linear vs Morton layouts of
    lineitem — the data-skipping audit. (Unregistered — 50-slot cap;
    driver-grade DuckDB parity + skipping-property assertions in
    tests/test_layout.py.)"""
    return zorder_layout_audit(load_table(spark, sf_dir, "lineitem"))


def _files_cte(layout: str, order_sql: str) -> str:
    return f"""
  SELECT '{layout}' AS layout,
         CAST(floor((rn - 1) * {N_FILES} / _n) AS BIGINT) AS file_id,
         l_partkey, l_suppkey, _mnp, _mxp, _mns, _mxs
  FROM (
    SELECT b.*,
           row_number() OVER (ORDER BY {order_sql}) AS rn
    FROM zcoded b
  )
"""


# the oracle's global rank is a plain window (serial is fine for the
# ORACLE; the engine side uses the two-phase plan)
ZORDER_LAYOUT_ORACLE = f"""
WITH stats AS (
  SELECT min(l_partkey) AS _mnp, max(l_partkey) AS _mxp,
         min(l_suppkey) AS _mns, max(l_suppkey) AS _mxs,
         count(*) AS _n
  FROM lineitem
),
based AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         _mnp, _mxp, _mns, _mxs, _n
  FROM lineitem, stats
),
bucketed AS (
  SELECT *,
         {BUCKET_SQL.format(v="l_partkey", mn="_mnp", mx="_mxp",
                            n=1 << ZBITS)} AS b1,
         {BUCKET_SQL.format(v="l_suppkey", mn="_mns", mx="_mxs",
                            n=1 << ZBITS)} AS b2
  FROM based
),
zcoded AS (SELECT *, {ZVALUE_SQL} AS z FROM bucketed)
SELECT layout, file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(l_partkey) AS min_partkey, max(l_partkey) AS max_partkey,
       min(l_suppkey) AS min_suppkey, max(l_suppkey) AS max_suppkey,
       round((max(l_partkey) - min(l_partkey) + 1)
             / CAST(any_value(_mxp) - any_value(_mnp) + 1 AS DOUBLE), 6)
         AS span_partkey,
       round((max(l_suppkey) - min(l_suppkey) + 1)
             / CAST(any_value(_mxs) - any_value(_mns) + 1 AS DOUBLE), 6)
         AS span_suppkey
FROM (
{_files_cte("linear", "l_partkey, l_orderkey, l_linenumber")}
  UNION ALL
{_files_cte("zorder", "z, l_orderkey, l_linenumber")}
)
GROUP BY layout, file_id
"""


UNREGISTERED_LAYOUT_QUERIES = {"q_zorder_layout": q_zorder_layout}
UNREGISTERED_LAYOUT_ORACLES = {"q_zorder_layout": ZORDER_LAYOUT_ORACLE}
