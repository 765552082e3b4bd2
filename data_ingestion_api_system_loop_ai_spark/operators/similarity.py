"""Similarity search over the ``embeddings`` table (SURVEY.md B15).

- ``q_similarity_topk``: exact brute-force cosine top-k for a query set —
  the correctness baseline. Dot products are a fold over ``zip_with``
  (JVM-side, no Python), left-to-right in element order so DuckDB's
  in-order ``list_sum`` reproduces the same doubles bit-for-bit.
- ``q_similarity_ivf``: the scale path — IVF-style search restricted to
  the query's coarse cell (here the precomputed ``label`` bucket, the
  moral equivalent of a k-means coarse quantizer). The pair scan becomes
  an equi-join on the cell id: shuffle-partitionable, per-cell quadratic
  instead of global quadratic. At 100 TB you'd add multi-probe (union of
  N nearest cells) — same plan shape, one more explode.

Both are oracle-checkable; a vectorized Pandas-UDF variant of the dot
product lives in ``udfs.py`` for the UDF-surface demo and benchmarking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.loader import load_table

TOPK = 10
IVF_TOPK = 5


def dot_expr(a: str, b: str) -> Column:
    """Left-fold dot product in double precision (order = element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for every 100th vector as query, brute force
    over all candidates (broadcast the small query side; the candidate
    scan stays partitioned). Norms are precomputed per side BEFORE the
    pair join — cosine inside the join is one dot product and one
    divide, not three dot products; identical doubles (same fold order),
    a third of the FLOPs."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr("embedding").alias("q_norm"),
    )
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm_expr("embedding").alias("c_norm"),
    )
    pairs = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK)
    )


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed cosine top-5: candidates restricted to the query's
    coarse cell (equi-join on the cell id = one hash shuffle)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr("embedding").alias("q_norm"),
        F.col("label").alias("cell"),
    )
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm_expr("embedding").alias("c_norm"),
        F.col("label").alias("cell"),
    )
    pairs = (
        cand.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= IVF_TOPK)
    )


SIMILARITY_QUERIES = {
    "q_similarity_topk": q_similarity_topk,
    "q_similarity_ivf": q_similarity_ivf,
}

_DOT = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)}"
        f" / (sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


SIMILARITY_ORACLES = {
    "q_similarity_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT query_id, vec_id AS neighbor_id,
         round({_cos('qe', 'embedding')}, 6) AS cosine
  FROM q, embeddings WHERE vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= {TOPK}
""",
    "q_similarity_ivf": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS cell
  FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT query_id, q.cell AS cell, e.vec_id AS neighbor_id,
         round({_cos('qe', 'e.embedding')}, 6) AS cosine
  FROM q JOIN embeddings e ON q.cell = e.label AND e.vec_id <> q.query_id
)
SELECT query_id, cell, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= {IVF_TOPK}
""",
}
