"""Collocation extraction over ``documents`` — pointwise mutual
information on adjacent token pairs (Church & Hanks 1990, the standard
corpus-linguistics association measure; in an LLM data pipeline it
feeds vocabulary/tokenizer decisions — which multi-word units deserve
merges — and boilerplate diagnosis — templated collocations surface at
the top).

    PMI(x, y) = ln( N * c_xy / (c_x * c_y) )

over ADJACENT pairs: c_xy = corpus count of the bigram, c_x / c_y =
corpus counts of bigram-position unigrams (first-of-pair and last
positions respectively, so the marginals sum to N and PMI has its
textbook normalization), N = total bigram count. A minimum-count floor
(MIN_PAIR) keeps the measure out of its known low-count pathology (PMI
maximizes on hapax pairs).

Spark shape (100 TB): bigrams come from the LET-BOUND token array (the
``_shingle_sets`` idiom — one tokenizer run per doc) and explode into
ONE map-side-combinable (x, y) count shuffle; the unigram marginals
derive from the bigram relation itself (sum by x / sum by y — two
shuffles over the vocabulary-bounded pair relation, not the corpus);
N is a 1-row broadcast. The PMI expression is a single ln per pair —
no summation-order concern. Top-k is TakeOrderedAndProject.

Reference parity: none (no analytics in the reference);
BASELINE.json north-star tier — text analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokenize
from ..sources.loader import load_table

MIN_PAIR = 5
COLLOC_TOPK = 20


def bigram_counts(docs: DataFrame) -> DataFrame:
    """(x, y, c_xy): corpus counts of adjacent token pairs."""
    pairs = F.element_at(
        F.transform(
            F.array(tokenize(F.col("text"))),
            lambda ts: F.when(
                F.size(ts) >= 2,
                F.transform(
                    F.slice(ts, 1, F.size(ts) - 1),
                    lambda x, i: F.struct(
                        x.alias("x"), F.element_at(ts, i + 2).alias("y")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>")),
        ),
        1,
    )
    return (
        docs.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.count("*").alias("c_xy"))
    )


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI among bigrams with count >=
    ``MIN_PAIR``: (x, y, c_xy, pmi), ordered (pmi desc, x, y).
    (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    constructed-collocation fixture in
    tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("text")
    bg = bigram_counts(docs)
    n = bg.agg(F.sum("c_xy").alias("N"))
    cx = bg.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    cy = bg.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    return (
        bg.filter(F.col("c_xy") >= MIN_PAIR)
        .join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            "c_xy",
            F.round(
                F.log(
                    F.col("N") * F.col("c_xy") / (F.col("c_x") * F.col("c_y"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "x", "y")
        .limit(COLLOC_TOPK)
    )


_TOKS = sql_tokens("text")

COLLOCATIONS_ORACLE = f"""
WITH toks AS (
  SELECT {_TOKS} AS ts FROM documents
),
bg AS (
  SELECT u.pair['x'] AS x, u.pair['y'] AS y, count(*) AS c_xy
  FROM toks,
       UNNEST(CASE WHEN len(ts) >= 2 THEN
         list_transform(range(1, len(ts)),
                        i -> {{'x': ts[i], 'y': ts[i+1]}})
         ELSE [] END) AS u(pair)
  GROUP BY 1, 2
),
n AS (SELECT sum(c_xy) AS N FROM bg),
cx AS (SELECT x, sum(c_xy) AS c_x FROM bg GROUP BY x),
cy AS (SELECT y, sum(c_xy) AS c_y FROM bg GROUP BY y)
SELECT bg.x, bg.y, bg.c_xy,
       round(ln(N * bg.c_xy / (c_x * c_y)), 6) AS pmi
FROM bg JOIN cx USING (x) JOIN cy USING (y), n
WHERE bg.c_xy >= {MIN_PAIR}
ORDER BY pmi DESC, bg.x, bg.y
LIMIT {COLLOC_TOPK}
"""
