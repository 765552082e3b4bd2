"""Similarity search over the ``embeddings`` table (SURVEY.md B15).

- ``q_similarity_topk``: exact brute-force cosine top-k for a query set —
  the correctness baseline. Dot products are a fold over ``zip_with``
  (JVM-side, no Python), left-to-right in element order so DuckDB's
  in-order ``list_sum`` reproduces the same doubles bit-for-bit.
- ``q_similarity_ivf``: the scale path — IVF multi-probe. Cells are the
  precomputed ``label`` buckets (the moral equivalent of a k-means
  coarse quantizer); per-cell centroids are computed exactly (decimal
  element sums, so both engines produce bit-identical doubles), each
  query ranks centroids by cosine and probes its NPROBE nearest cells,
  and the candidate scan is an equi-join on the probed cell ids:
  shuffle-partitionable, per-cell quadratic instead of global
  quadratic. Multi-probe is what makes IVF recall usable at 100 TB —
  a query near a cell boundary still sees its true neighbors.

Both are oracle-checkable; a vectorized Pandas-UDF variant of the dot
product lives in ``udfs.py`` for the UDF-surface demo and benchmarking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.loader import load_table

TOPK = 10
IVF_TOPK = 5
NPROBE = 2  # cells probed per query (own + next-nearest, typically)


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
    """IVF multi-probe cosine top-5: per-cell centroids (exact decimal
    element sums -> bit-identical doubles on both engines), each query
    probes its NPROBE nearest cells by centroid cosine, candidates are
    an equi-join on the probed cell ids. The centroid relation is tiny
    (cells x dims) and broadcast; the big candidate side shuffles once
    on the cell id. A query near a cell boundary still finds neighbors
    in the adjacent cell — the recall fix that makes IVF usable."""
    e = load_table(spark, sf_dir, "embeddings")
    # exact centroids: decimal element sums (order-independent), double
    # division by the count — both engines produce identical doubles
    cent = (
        e.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(25,12)")).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))), lambda s: s["cv"]
            ).alias("centroid")
        )
    )
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr("embedding").alias("q_norm"),
    )
    wp = W.partitionBy("query_id").orderBy(F.col("cent_cos").desc(), F.col("label"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cent_cos", cosine_expr("q_emb", "centroid"))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", "q_emb", "q_norm", F.col("label").alias("cell"))
    )
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm_expr("embedding").alias("c_norm"),
        F.col("label").alias("cell"),
    )
    pairs = (
        cand.join(F.broadcast(probes), "cell")
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
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings WHERE vec_id % 100 = 0
),
flat AS (
  SELECT label,
         unnest(list_transform(range(1, len(embedding)+1),
                               i -> {{'i': i, 'v': embedding[i]}})) AS s
  FROM embeddings
),
centf AS (
  SELECT label, s.i AS i,
         CAST(SUM(CAST(s.v AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS cv
  FROM flat GROUP BY label, s.i
),
cent AS (
  SELECT label, list(cv ORDER BY i) AS centroid FROM centf GROUP BY label
),
probes AS (
  SELECT query_id, label AS cell FROM (
    SELECT q.query_id, c.label,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos('qe', 'centroid')} DESC, c.label) AS pr
    FROM q, cent c
  ) WHERE pr <= {NPROBE}
),
pairs AS (
  SELECT p.query_id, e.label AS cell, e.vec_id AS neighbor_id,
         round({_cos('qe', 'e.embedding')}, 6) AS cosine
  FROM probes p
  JOIN q USING (query_id)
  JOIN embeddings e ON e.label = p.cell AND e.vec_id <> p.query_id
)
SELECT query_id, cell, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= {IVF_TOPK}
""",
}
