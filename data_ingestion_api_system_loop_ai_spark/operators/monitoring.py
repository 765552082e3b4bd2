"""Data-quality / drift monitoring over the ``events`` stream — the
observability side of a production pipeline (a 100 TB ingest without
drift alarms silently trains on a shifted distribution).

``q_psi_drift`` computes the POPULATION STABILITY INDEX — the standard
industry drift metric (credit-risk origin, now the default model-
monitoring statistic): bucket the metric's value distribution in a
reference window and a current window, then

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

with the usual reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
action. Engineering choices, all for engine portability + scale:

- the reference/current split is the corpus's own time MIDPOINT in
  epoch microseconds — integer arithmetic, identical on both engines
  (one 1-row broadcast min/max aggregate);
- value buckets are the fixed-width integer-cents histogram of the
  quantile sketch (``(max_cents + BINS) div BINS`` width — one more
  1-row broadcast), NOT data-dependent quantile edges, so bucket
  boundaries are bit-stable across engines and across runs;
- counts get +1 smoothing per (bucket, side) so ln never sees zero —
  the documented PSI convention for empty buckets;
- the per-type PSI sums over a BUCKET-SORTED fold (the lm_score
  idiom), pinning float summation order on both engines.

Scale: two 1-row broadcasts plus ONE map-side-combinable
(event_type, bucket, side) count shuffle over the corpus; everything
after runs on <= types x buckets x 2 rows. Rounding to 6 keeps the
ln/division noise inside the hash gate like the BM25/idf precedent.

Reference parity: none (no analytics in the reference);
BASELINE.json north-star tier — pipeline observability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

PSI_BINS = 16


def psi_drift(
    df: DataFrame, group_col: str, value_col: str, ts_col: str
) -> DataFrame:
    """(group, n_ref, n_cur, psi): PSI of ``value_col``'s distribution
    between the first and second half of ``ts_col``'s span, per
    ``group_col``."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    # NTZ-native epoch micros (parquet timestamps surface as
    # TIMESTAMP_NTZ in Spark 4, which unix_micros rejects) — identical
    # to DuckDB's epoch_us over the same NTZ values
    base = df.select(
        F.col(group_col).alias("grp"),
        cents.alias("c"),
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).alias("us"),
    )
    stats = base.agg(
        F.min("us").alias("t0"),
        F.max("us").alias("t1"),
        F.max("c").alias("mx"),
    ).select(
        F.expr("t0 + (t1 - t0) div 2").alias("mid"),
        F.expr(f"(mx + {PSI_BINS}) div {PSI_BINS}").alias("w"),
    )
    counted = (
        base.crossJoin(F.broadcast(stats))
        .select(
            "grp",
            F.expr("c div w").alias("bucket"),
            (F.col("us") <= F.col("mid")).alias("is_ref"),
        )
        .groupBy("grp", "bucket")
        .agg(
            F.count_if("is_ref").alias("nr"),
            F.count_if(~F.col("is_ref")).alias("nc"),
        )
    )
    return psi_from_bucket_counts(counted).select(
        F.col("grp").alias("event_type"), "n_ref", "n_cur", "psi"
    )


def psi_from_bucket_counts(counted: DataFrame) -> DataFrame:
    """(grp, n_ref, n_cur, psi) from a (grp, bucket, nr, nc) count
    relation — the PSI tail shared by the batch split (psi_drift) and
    the streaming monitor (drift_stream_writer): +1 smoothing per
    present bucket (denominators grow by the bucket count so fractions
    still sum to 1 per side), bucket-sorted fold pinning float
    summation order. Aliases disambiguate the join of ``counted`` with
    its own aggregate."""
    tot = counted.groupBy("grp").agg(
        F.sum("nr").alias("Nr"),
        F.sum("nc").alias("Nc"),
        F.count("*").alias("nb"),
    )
    p = (F.col("c.nr") + 1) / (F.col("t.Nr") + F.col("t.nb"))
    q = (F.col("c.nc") + 1) / (F.col("t.Nc") + F.col("t.nb"))
    contrib = counted.alias("c").join(tot.alias("t"), "grp").select(
        "grp",
        F.col("c.bucket").alias("bucket"),
        ((p - q) * F.log(p / q)).alias("term"),
        F.col("t.Nr").alias("Nr"),
        F.col("t.Nc").alias("Nc"),
    )
    return contrib.groupBy("grp").agg(
        F.max("Nr").alias("n_ref"),
        F.max("Nc").alias("n_cur"),
        # bucket-sorted fold: pinned summation order
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("psi"),
    )


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the ``value`` distribution per event_type between the
    first and second half of the events table's time span.
    (Registered since round 5; known-shift fixture tests in
    tests/test_unregistered_ops.py.)"""
    return psi_drift(
        load_table(spark, sf_dir, "events"), "event_type", "value", "ts"
    ).orderBy("event_type")


PSI_DRIFT_ORACLE = f"""
WITH base AS (
  SELECT event_type AS grp,
         CAST(round(value * 100) AS BIGINT) AS c,
         epoch_us(ts) AS us
  FROM events
),
stats AS (
  SELECT min(us) + (max(us) - min(us)) // 2 AS mid,
         (max(c) + {PSI_BINS}) // {PSI_BINS} AS w
  FROM base
),
counted AS (
  SELECT grp, c // w AS bucket,
         sum(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN us <= mid THEN 0 ELSE 1 END) AS nc
  FROM base, stats GROUP BY 1, 2
),
tot AS (
  SELECT grp, sum(nr) AS Nr, sum(nc) AS Nc, count(*) AS nb
  FROM counted GROUP BY grp
),
contrib AS (
  SELECT c.grp, c.bucket,
         (((c.nr + 1) * 1.0 / (t.Nr + t.nb)) - ((c.nc + 1) * 1.0 / (t.Nc + t.nb)))
         * ln(((c.nr + 1) * 1.0 / (t.Nr + t.nb)) / ((c.nc + 1) * 1.0 / (t.Nc + t.nb)))
         AS term,
         t.Nr AS Nr, t.Nc AS Nc
  FROM counted c JOIN tot t USING (grp)
)
SELECT grp AS event_type,
       CAST(max(Nr) AS BIGINT) AS n_ref, CAST(max(Nc) AS BIGINT) AS n_cur,
       round(list_sum(list(term ORDER BY bucket)), 6) AS psi
FROM contrib
GROUP BY grp
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Continuous drift monitoring: a PERSISTED reference histogram + a
# streaming PSI monitor. The batch q_psi_drift compares two halves of
# one table; production monitoring freezes a reference distribution
# once (the histogram is the build artifact — the quantile sketch's
# cells with their width) and scores every arriving micro-batch
# against it, appending one PSI row per batch to a drift log. Frozen
# binning is the point: the REFERENCE defines the buckets, so scores
# are comparable across batches and a width recomputed per batch could
# not hide a shift.
# ---------------------------------------------------------------------------

_REF_MARKER = "_COMMITTED"


def build_reference_histogram(
    df: DataFrame, value_col: str, path: str, bins: int = PSI_BINS
) -> None:
    """Persist the reference distribution of ``value_col``: cells
    (bucket, c) parquet + meta.json {w, n, bins}, committed with the
    atomic marker (readers refuse a half-written reference)."""
    import json
    import os

    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(cents.alias("c"))
    w = base.agg(
        F.expr(f"(max(c) + {bins}) div {bins}").alias("w"),
        F.count("*").alias("n"),
    ).collect()[0]
    cells = base.select(F.expr(f"c div {w['w']}").alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count("*").alias("c"))
    cells.write.mode("overwrite").parquet(os.path.join(path, "cells"))
    tmp = os.path.join(path, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"w": w["w"], "n": w["n"], "bins": bins}, f)
    os.replace(tmp, os.path.join(path, "meta.json"))
    mtmp = os.path.join(path, f".{_REF_MARKER}.tmp")
    with open(mtmp, "w") as f:
        f.write("ok")
    os.replace(mtmp, os.path.join(path, _REF_MARKER))


def psi_against_reference(
    spark: SparkSession, batch_df: DataFrame, value_col: str, ref_path: str
) -> float:
    """PSI of ``batch_df[value_col]`` against the persisted reference —
    batch values bucket with the REFERENCE's frozen width (values past
    the trained range land in higher buckets, which smoothing handles:
    a mass excursion outside the reference range IS drift)."""
    import json
    import os

    if not os.path.exists(os.path.join(ref_path, _REF_MARKER)):
        raise FileNotFoundError(
            f"reference histogram at {ref_path} has no {_REF_MARKER} marker"
        )
    with open(os.path.join(ref_path, "meta.json")) as f:
        meta = json.load(f)
    ref = spark.read.parquet(os.path.join(ref_path, "cells")).select(
        "bucket", F.col("c").alias("nr")
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    cur = (
        batch_df.select(cents.alias("_c"))
        .select(F.expr(f"_c div {meta['w']}").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("nc"))
    )
    counted = (
        ref.join(cur, "bucket", "full_outer")
        .select(
            F.lit("m").alias("grp"),
            "bucket",
            F.coalesce("nr", F.lit(0)).alias("nr"),
            F.coalesce("nc", F.lit(0)).alias("nc"),
        )
    )
    row = psi_from_bucket_counts(counted).collect()[0]
    return row["psi"]


def drift_stream_writer(
    spark: SparkSession, value_col: str, ref_path: str, log_path: str
):
    """A ``foreachBatch`` callable scoring every micro-batch against
    the persisted reference and appending (batch_id, n, psi) to a
    parquet drift log — the alerting surface (a production run attaches
    a threshold watcher to the log). Append-idempotence rides the
    deterministic batch_id: a replayed batch overwrites its own
    partition directory (``batch=<id>``), never duplicating log rows."""
    import os

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        psi = psi_against_reference(spark, batch_df, value_col, ref_path)
        spark.createDataFrame(
            [(batch_id, n, float(psi))], "batch_id long, n long, psi double"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(log_path, f"batch={batch_id}")
        )

    return write_batch

# Registered in the round-5 rotation (slot funded by q_watermark_late);
# ROTATED OFF in round 11 (VERDICT r10 #4: its slot funds
# q_crawl_funnel_report, and the drift pair was redundant registry
# signal — the sibling q_ks_drift stays registered). The full
# DuckDB-parity oracle stays pinned by the direct test below and the
# q_psi_drift entry keeps driver-grade coverage on the unregistered
# surface.
MONITORING_QUERIES = {}
MONITORING_ORACLES = {}
UNREGISTERED_MONITORING_QUERIES = {"q_psi_drift": q_psi_drift}
UNREGISTERED_MONITORING_ORACLES = {"q_psi_drift": PSI_DRIFT_ORACLE}
# q_ks_drift joined in the round-6 rotation (funded by q_join_shuffle's
# slot); it is defined below, so registration happens at module end.


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov drift — the binning-free complement to PSI: the
# max gap between the two halves' empirical CDFs over the exact
# value-cent domain. PSI needs a bucket width and smoothing constants;
# KS is parameter-free and catches location shifts PSI's coarse bins
# can blur. Per group: exact integer counts per distinct cent value,
# one group-partitioned running-sum window over the (group, value)
# relation (bounded by the quantized value domain, never corpus-sized
# rows per partition beyond it), max |ΔCDF| as a plain max aggregate —
# order-independent, so no fold pinning is needed.
# ---------------------------------------------------------------------------


def ks_drift(
    df: DataFrame, group_col: str, value_col: str, ts_col: str
) -> DataFrame:
    """(event_type, n_ref, n_cur, ks): two-sample KS statistic of
    ``value_col`` between the first and second half of ``ts_col``'s
    span, per group."""
    from pyspark.sql.window import Window as W

    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(group_col).alias("grp"),
        cents.alias("c"),
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).alias("us"),
    )
    stats = base.agg(
        F.expr("min(us) + (max(us) - min(us)) div 2").alias("mid")
    )
    counted = (
        base.crossJoin(F.broadcast(stats))
        .select("grp", "c", (F.col("us") <= F.col("mid")).alias("is_ref"))
        .groupBy("grp", "c")
        .agg(
            F.count_if("is_ref").alias("nr"),
            F.count_if(~F.col("is_ref")).alias("nc"),
        )
    )
    run = (
        W.partitionBy("grp")
        .orderBy("c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = counted.groupBy("grp").agg(
        F.sum("nr").alias("Nr"), F.sum("nc").alias("Nc")
    )
    cum = counted.select(
        "grp",
        F.sum("nr").over(run).alias("cr"),
        F.sum("nc").over(run).alias("cc"),
    )
    gap = F.abs(
        F.col("cr") / F.col("Nr") - F.col("cc") / F.col("Nc")
    )
    return (
        cum.join(tot, "grp")
        .groupBy("grp")
        .agg(
            F.max("Nr").alias("n_ref"),
            F.max("Nc").alias("n_cur"),
            F.round(F.max(gap), 6).alias("ks"),
        )
        .select(F.col("grp").alias("event_type"), "n_ref", "n_cur", "ks")
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS drift of ``value`` per event_type between the events table's
    time halves. (Registered in the round-6 rotation, funded by
    q_join_shuffle's slot; known-shift fixtures stay in
    tests/test_unregistered_ops.py.)"""
    return ks_drift(
        load_table(spark, sf_dir, "events"), "event_type", "value", "ts"
    ).orderBy("event_type")


KS_DRIFT_ORACLE = """
WITH base AS (
  SELECT event_type AS grp,
         CAST(round(value * 100) AS BIGINT) AS c,
         epoch_us(ts) AS us
  FROM events
),
stats AS (SELECT min(us) + (max(us) - min(us)) // 2 AS mid FROM base),
counted AS (
  SELECT grp, c,
         sum(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN us <= mid THEN 0 ELSE 1 END) AS nc
  FROM base, stats GROUP BY 1, 2
),
tot AS (SELECT grp, sum(nr) AS Nr, sum(nc) AS Nc FROM counted GROUP BY grp),
cum AS (
  SELECT grp,
         sum(nr) OVER w AS cr, sum(nc) OVER w AS cc
  FROM counted
  WINDOW w AS (PARTITION BY grp ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT grp AS event_type,
       CAST(max(Nr) AS BIGINT) AS n_ref, CAST(max(Nc) AS BIGINT) AS n_cur,
       round(max(abs(CAST(cr AS DOUBLE) / Nr - CAST(cc AS DOUBLE) / Nc)), 6)
         AS ks
FROM cum JOIN tot USING (grp)
GROUP BY grp
ORDER BY grp
"""

# Round-6 rotation: registered after definition (see note at the
# MONITORING_QUERIES declaration above).
MONITORING_QUERIES["q_ks_drift"] = q_ks_drift
MONITORING_ORACLES["q_ks_drift"] = KS_DRIFT_ORACLE
