"""Benchmark decontamination for training corpora.

Before training, every serious pipeline checks the corpus for
verbatim n-gram overlap with its evaluation benchmarks (the GPT-3 /
PaLM "13-gram decontamination" step): a training document sharing even
one long n-gram with an eval document leaks the benchmark into the
weights. This module computes that overlap as a DataFrame join:

- shingle both sides into distinct word ``NGRAM_K``-grams (the shared
  ``shingles_k`` builder used by the dedup family);
- inverted-index equi-join training shingles against eval shingles;
- per training doc: how many distinct n-grams collide, how many eval
  docs are hit, the collision fraction, and the drop verdict.

Scale design: the eval side is a benchmark suite — thousands of
documents against a 100 TB corpus — so its exploded shingle relation
is BROADCAST and the probe over the training corpus is a map-side
hash join: no shuffle of the big side at all. (The alternative — a
shuffle equi-join on the shingle — is the fallback when a giant eval
suite outgrows broadcast.) The left join back onto the full training
set is a broadcast of the tiny hit relation for the same reason.
``NGRAM_K`` is 4 here because the synthetic corpus draws ~40 words;
production decontamination uses 13-grams over natural text — the plan
is identical, only the shingle width changes.

The reference (an ingestion API) has no training surface; this module
belongs to the mandated LLM-pipeline extension tier, next to
``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles_k, sql_tokens, tokenize
from ..sources.loader import load_table

NGRAM_K = 4  # production: 13 (natural-text n-gram entropy is far higher)
# deterministic stand-in for "the benchmark suite": every 20th document
EVAL_MOD, EVAL_REM = 20, 7


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = NGRAM_K,
) -> DataFrame:
    """Per-training-document contamination report against an eval set.

    Returns one row per training doc: ``n_shingles`` (its distinct
    k-grams), ``n_collisions`` (how many of them appear in ANY eval
    doc), ``n_eval_docs`` (distinct eval docs sharing at least one),
    ``overlap_frac``, and ``contaminated`` (any collision at all — the
    conservative production rule: one shared 13-gram is disqualifying).
    """
    t_sh = train.select(
        F.col(key_col).alias("doc_id"),
        F.explode(shingles_k(tokenize(F.col(text_col)), k)).alias("s"),
    )
    e_sh = eval_docs.select(
        F.col(key_col).alias("eval_id"),
        F.explode(shingles_k(tokenize(F.col(text_col)), k)).alias("s"),
    )
    hits = (
        t_sh.join(F.broadcast(e_sh), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_collisions"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
    sizes = train.select(
        F.col(key_col).alias("doc_id"),
        F.size(shingles_k(tokenize(F.col(text_col)), k)).cast("long").alias(
            "n_shingles"
        ),
    )
    return sizes.join(F.broadcast(hits), "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_collisions", F.lit(0)).cast("long").alias("n_collisions"),
        F.coalesce("n_eval_docs", F.lit(0)).cast("long").alias("n_eval_docs"),
        F.round(
            F.coalesce("n_collisions", F.lit(0))
            / F.greatest(F.col("n_shingles"), F.lit(1)),
            6,
        ).alias("overlap_frac"),
        (F.coalesce("n_collisions", F.lit(0)) > 0).alias("contaminated"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminate ``documents``: docs with ``doc_id % 20 == 7`` play
    the benchmark suite; every other doc is training corpus. Output is
    the per-training-doc contamination report."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % EVAL_MOD == EVAL_REM
    return contamination_report(docs.filter(~is_eval), docs.filter(is_eval))


_GRAM = " || ' ' || ".join(f"tokens[i+{j}]" for j in range(NGRAM_K))

CONTAMINATION_ORACLES = {
    "q_decontaminate": f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS tokens FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(tokens) - {NGRAM_K - 1}, 0) + 1),
           i -> {_GRAM}))) AS s
  FROM toks
),
tr AS (SELECT doc_id, s FROM sh WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}),
ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
hits AS (
  SELECT tr.doc_id,
         count(DISTINCT tr.s) AS n_collisions,
         count(DISTINCT ev.eval_id) AS n_eval_docs
  FROM tr JOIN ev USING (s) GROUP BY tr.doc_id
),
sizes AS (
  SELECT doc_id,
         CAST(len(list_distinct(list_transform(
           range(1, greatest(len(tokens) - {NGRAM_K - 1}, 0) + 1),
           i -> {_GRAM}))) AS BIGINT) AS n_shingles
  FROM toks WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}
)
SELECT sizes.doc_id, n_shingles,
       CAST(coalesce(n_collisions, 0) AS BIGINT) AS n_collisions,
       CAST(coalesce(n_eval_docs, 0) AS BIGINT) AS n_eval_docs,
       round(coalesce(n_collisions, 0) * 1.0 / greatest(n_shingles, 1), 6)
         AS overlap_frac,
       coalesce(n_collisions, 0) > 0 AS contaminated
FROM sizes LEFT JOIN hits ON sizes.doc_id = hits.doc_id
""",
}

CONTAMINATION_QUERIES = {
    "q_decontaminate": q_decontaminate,
}
