"""Spherical k-means over the ``embeddings`` table — the production
grouping behind SemDeDup-style pruning and IVF index training, run to
convergence instead of the single Lloyd step the PQ codebooks take.

Spherical variant (Dhillon & Modha 2001): assignment by MAX COSINE,
centroid update = per-cell mean (cosine is norm-invariant, so the mean
need not be renormalized for assignment; the objective below evaluates
against normalized centroids, under which the alternation is
monotonically non-decreasing). Completes the engine's iterative trio —
PageRank (fixed-point), connected components (contraction), k-means
(alternating optimization) — all the same Spark shape:

- driver-side control flow ONLY: per round one aggregated objective
  scalar crosses to the driver, never data;
- per round ONE broadcast of the k-row centroid relation against the
  corpus, argmax as a map-side-combinable ``max(struct(...))`` (the
  ``ivf_assign`` idiom — no n·k-row shuffle survives to the exchange),
  then ONE (cell, dim) hash aggregate with decimal(25,12) element sums
  for the exact centroid means;
- ``localCheckpoint`` every round keeps the plan depth O(1).

Determinism end to end: seeds are the systematic sample (every
floor(n/k)-th vector in vec_id rank order — no RNG), cosine ties break
to the smallest seed ordinal, and centroid means are decimal-exact, so
repeated runs produce identical assignments and the single-step form
is DuckDB-checkable (the multi-step loop is non-SQL-expressible —
fixed-depth SQL cannot iterate; the recursive-CTE escape hatch DuckDB
allows for CC does not extend to re-aggregation per round).

Reference parity: no analytics surface in the reference; BASELINE.json
north-star tier (similarity / dedup infrastructure at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ranking import global_row_number
from ..sources.loader import load_table
from .similarity import dot_expr, norm_expr

KMEANS_K = 16
KMEANS_ITERS = 4


def kmeans_seeds(e: DataFrame, k: int = KMEANS_K) -> DataFrame:
    """(cell, centroid) initial centroids: the systematic sample —
    every floor(n/k)-th vector in vec_id rank order, cell = sample
    ordinal 0..k-1. RNG-free (k-means++ trades determinism for faster
    convergence; at fixed iteration count determinism wins here)."""
    stats = e.agg(F.count("*").alias("n")).select(
        F.greatest((F.col("n") / k).cast("long"), F.lit(1)).alias("step")
    )
    ids = e.select("vec_id").withColumn(
        "_bkt", (F.col("vec_id") / 4096).cast("long")
    )
    seed_ids = (
        global_row_number(ids, ["_bkt"], ["vec_id"], rn_col="_rn")
        .crossJoin(F.broadcast(stats))
        .filter(((F.col("_rn") - 1) % F.col("step") == 0) & (F.col("_rn") - 1 < k * F.col("step")))
        .select("vec_id", ((F.col("_rn") - 1) / F.col("step")).cast("int").alias("cell"))
    )
    return e.join(F.broadcast(seed_ids), "vec_id").select(
        "cell",
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )


def kmeans_assign(e: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cell, cos) — every vector to its max-cosine centroid,
    ties to the smallest cell ordinal; one broadcast, argmax via
    map-side-combinable max(struct)."""
    v = e.select("vec_id", "embedding", norm_expr("embedding").alias("_vn"))
    c = centroids.select(
        "cell", "centroid", norm_expr("centroid").alias("_cn")
    )
    best = F.max(
        F.struct(
            (
                dot_expr("embedding", "centroid")
                / (F.col("_vn") * F.col("_cn"))
            ).alias("c"),
            (-F.col("cell")).alias("neg"),
            F.col("cell").alias("cell"),
        )
    ).alias("b")
    return (
        v.crossJoin(F.broadcast(c))
        .groupBy("vec_id")
        .agg(best)
        .select("vec_id", F.col("b.cell").alias("cell"), F.col("b.c").alias("cos"))
    )


def _recompute(e: DataFrame, asg: DataFrame) -> DataFrame:
    """(cell, centroid) decimal-exact per-cell element means."""
    return (
        e.join(asg.select("vec_id", "cell"), "vec_id")
        .select("cell", F.posexplode("embedding").alias("i", "v"))
        .groupBy("cell", "i")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(25,12)")).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))),
                lambda s: s["cv"],
            ).alias("centroid")
        )
    )


def kmeans_fit(
    e: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Run ``iters`` Lloyd rounds; returns (assignment, centroids,
    per-round objective). The objective is the mean cosine of vectors
    to their assigned (normalized) centroid — non-decreasing across
    rounds up to float noise, which the tests pin."""
    centroids = kmeans_seeds(e, k).localCheckpoint()
    objective: list[float] = []
    asg = None
    for _ in range(iters):
        asg = kmeans_assign(e, centroids).localCheckpoint()
        objective.append(asg.agg(F.avg("cos")).collect()[0][0])
        centroids = _recompute(e, asg).localCheckpoint()
    return asg, centroids, objective


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final spherical-k-means assignment (vec_id, cell, cos round 6)
    after KMEANS_ITERS rounds. (Unregistered, NON-SQL-EXPRESSIBLE —
    fixed-depth SQL cannot iterate Lloyd rounds; direct tests pin
    single-step DuckDB parity, determinism, and objective monotonicity
    in tests/test_unregistered_ops.py.)"""
    e = load_table(spark, sf_dir, "embeddings")
    asg, _cent, _obj = kmeans_fit(e)
    return asg.select(
        "vec_id", "cell", F.round("cos", 6).alias("cos")
    )


# Single Lloyd step (seed -> assign) IS SQL-expressible; the direct
# test checks the first assignment round against this oracle, pinning
# the seeds, the cosine argmax, and the tiebreak — the loop then only
# re-applies the same two relations.
def kmeans_step_oracle(dim: int, k: int = KMEANS_K) -> str:
    return f"""
WITH ranked AS (
  SELECT vec_id, embedding,
         row_number() OVER (ORDER BY vec_id) - 1 AS rn
  FROM embeddings
),
stats AS (
  SELECT greatest(CAST(count(*) / {k} AS BIGINT), 1) AS step FROM embeddings
),
seeds AS (
  SELECT CAST(rn / step AS INTEGER) AS cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM ranked, stats
  WHERE rn % step = 0 AND rn < {k} * step
),
scored AS (
  SELECT e.vec_id, s.cell,
         list_sum(list_transform(range(1, {dim} + 1),
             i -> CAST(e.embedding[i] AS DOUBLE) * s.centroid[i]))
         / (sqrt(list_sum(list_transform(range(1, {dim} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, {dim} + 1),
               i -> s.centroid[i] * s.centroid[i])))) AS c
  FROM embeddings e CROSS JOIN seeds s
)
SELECT vec_id, CAST(cell AS INTEGER) AS cell, round(c, 6) AS cos
FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cell ASC) AS rnk
  FROM scored
) WHERE rnk = 1
"""
