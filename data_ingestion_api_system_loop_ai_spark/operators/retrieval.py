"""BM25 relevance ranking over the ``documents`` table (SURVEY.md B54).

The training-data use case: given a small fixed probe-term set (a
benchmark query, a topic filter, a contamination probe), rank the
corpus by BM25 so downstream stages can keep / drop / re-weight the
most relevant documents. Classic BM25 (Robertson/Sparck Jones; the
Lucene ``+1`` idf form, which is always positive) with k1=1.2, b=0.75.

Plan shape — the part that matters at 100 TB: because the query-term
set is small and fixed, per-term term frequencies are computed as
in-row array filters over the tokenized text (NO explode, NO
(doc,term) shuffle), corpus statistics (N, Σdl, per-term document
frequencies) are ONE 1-row aggregate broadcast back over the scan, and
the final top-k is TakeOrderedAndProject. The whole query runs with no
hash-partitioned exchange of the corpus: one scan + a 1-row broadcast
+ per-partition top-k (plan-asserted in tests). The inverted-index
formulation (explode → posting join) only wins when the query set is
large or ad hoc; for fixed probes this projection form is strictly
better — it is the same let-bound-array idiom that took
q_quality_filter from 19 s to 2 s (README "Performance notes").

Determinism: every arithmetic step is written as the SAME double
expression tree on both engines (int→double promotions included), the
per-document score is a fixed-order sum over the literal term list,
and ties break on doc_id — so the DuckDB oracle reproduces the exact
top-k. ln() may differ in the last ulp across libm builds; the
driver's 9-significant-digit compare absorbs that (same allowance the
cosine operators rely on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokenize
from ..sources.loader import load_table

# Fixed probe-term set: mid-frequency tokens of the synthetic corpus
# vocabulary. Literal and ordered — the score sum folds in this order.
BM25_TERMS = ("query", "join", "stream", "filter", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _tf(tokens: Column, term: str) -> Column:
    """In-row term frequency: count of exact-match tokens (no explode)."""
    return F.size(F.filter(tokens, lambda x: x == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Score ``docs(doc_id, text)`` against ``terms``; returns every doc
    with ``n_hit`` (matched term count) and ``bm25`` (double score).

    Scale: one scan; stats are a 1-row broadcast; no corpus shuffle.

    ``stats`` defaults to aggregating the corpus inside the query (the
    oracle-checked inline form); a persisted model passes its stored
    1-row (n_docs, sum_dl, df_0..df_{k-1}) relation instead
    (``operators/text_models.py``) — all counts are longs and the score
    expression tree below is unchanged, so from-model scores are
    bit-identical (pinned by test).
    """
    # LET BINDING, one step further than the _shingle_sets idiom
    # (operators/quality.py:70-92): extracting N fields from a struct
    # column re-evaluates the whole struct (and its tokenize) once per
    # field after CollapseProject. Emitting the 1-element struct array
    # through F.inline instead routes it through a Generate node, whose
    # generator expression is evaluated ONCE per row and whose outputs
    # are real attributes — tokenize runs exactly once per document no
    # matter how many tf columns are derived.
    toks = tokenize(F.col("text"))
    packed = F.transform(
        F.array(toks),
        lambda ts: F.struct(
            F.size(ts).alias("dl"),
            *[_tf(ts, t).alias(f"tf_{i}") for i, t in enumerate(terms)],
        ),
    )
    base = docs.select("doc_id", F.inline(packed))
    if stats is None:
        stats = base.agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            *[
                F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
                for i in range(len(terms))
            ],
        )
    s = base.crossJoin(F.broadcast(stats))

    # avgdl and the per-term contribution, written as the identical
    # double expression tree the oracle uses (promotion points match).
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")

    def contrib(i: int) -> Column:
        tf = F.col(f"tf_{i}")
        df = F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * (F.col("dl") / avgdl)
        )
        return idf * (tf * F.lit(BM25_K1 + 1.0)) / denom

    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)
    n_hit = (F.col("tf_0") > 0).cast("int")
    for i in range(1, len(terms)):
        n_hit = n_hit + (F.col(f"tf_{i}") > 0).cast("int")

    return s.select(
        "doc_id",
        "dl",
        n_hit.cast("int").alias("n_hit"),
        score.alias("bm25"),
    )


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54 — top-20 documents by BM25 against the fixed probe terms.

    Shuffle-free scoring + TakeOrderedAndProject top-k (ties on doc_id).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(bm25_scores(docs))


def bm25_topk(scored: DataFrame) -> DataFrame:
    """Top-k cut shared by the inline and from-model forms."""
    return (
        scored.filter(F.col("n_hit") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


def _sql_contrib(i: int) -> str:
    return (
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i} * {BM25_K1 + 1.0!r})"
        f" / (tf_{i} + {BM25_K1!r} * (1.0 - {BM25_B!r} + {BM25_B!r}"
        f" * (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))"
    )


def bm25_oracle_sql(terms: tuple[str, ...] = BM25_TERMS) -> str:
    """DuckDB twin of :func:`q_bm25_rank` — same expression trees,
    same fixed-order sum, same tiebreak."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(tokens, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    hit = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    score = " + ".join(_sql_contrib(i) for i in range(len(terms)))
    return f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS tokens FROM documents
), base AS (
  SELECT doc_id, CAST(len(tokens) AS INTEGER) AS dl,
         {tf_cols}
  FROM toks
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
         {df_cols}
  FROM base
)
SELECT doc_id, dl, CAST({hit} AS INTEGER) AS n_hit,
       {score} AS bm25
FROM base, stats
WHERE {hit} > 0
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion — hybrid ranking (Cormack et al. 2009), the
# standard way to combine heterogeneous rankers (BM25 + dense retrieval
# in search; here BM25 relevance + unigram-LM fluency, the corpus-
# curation pairing). RRF only needs each ranker's TOP-D list: both
# inputs arrive as TakeOrderedAndProject top-20s (never a global sort),
# rank assignment runs on D-row relations (constant-bounded — the same
# O(#buckets)-serial-work argument as plans/ranking.py's prefix sums),
# and the fusion itself is one full-outer join on doc_id.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_DEPTH = BM25_TOPK  # fuse each ranker's top-20


def q_hybrid_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rank_bm25, rank_lm, rrf, fused_rank): RRF over the
    BM25 top-20 and the 20 most-fluent docs under the corpus unigram
    LM (lowest mean surprisal). A doc missing from one list simply
    contributes nothing for it (the standard RRF convention — NULL
    rank, not a penalty). ``rrf = sum 1/(60 + rank)``, two fixed-order
    double terms — identical arithmetic on both engines.
    (Unregistered — 50-slot cap; driver-grade DuckDB parity in
    tests/test_unregistered_ops.py.)"""
    from .lm_score import lm_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return rrf_fuse(q_bm25_rank(spark, sf_dir), lm_scores(docs))


def rrf_fuse(bm25_top: DataFrame, lm_scored: DataFrame) -> DataFrame:
    """The fusion plan against given ranker outputs (``bm25_top`` =
    a BM25 top-k relation carrying ``bm25``; ``lm_scored`` = a full
    ``lm_scores`` relation) — shared by the train-inside form above and
    the persisted-model form in ``text_models.q_hybrid_rank_from_model``
    so both fuse identically."""
    from pyspark.sql import Window as W

    # both windows run over <= RRF_DEPTH rows (post-limit) — bounded
    # constant, not a corpus-sized single-partition funnel
    a = (
        bm25_top.select("doc_id", "bm25")
        .withColumn(
            "rank_bm25",
            F.row_number()
            .over(W.orderBy(F.col("bm25").desc(), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "rank_bm25")
    )
    b = (
        lm_scored.orderBy(F.col("mean_surprisal").asc(), "doc_id")
        .limit(RRF_DEPTH)
        .withColumn(
            "rank_lm",
            F.row_number()
            .over(W.orderBy(F.col("mean_surprisal").asc(), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "rank_lm")
    )
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_bm25")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_lm")), F.lit(0.0)),
        6,
    )
    fused = a.join(b, "doc_id", "full_outer").withColumn("rrf", rrf)
    return fused.withColumn(
        "fused_rank",
        F.row_number()
        .over(W.orderBy(F.col("rrf").desc(), "doc_id"))
        .cast("long"),
    ).select("doc_id", "rank_bm25", "rank_lm", "rrf", "fused_rank")


def hybrid_rank_oracle_sql() -> str:
    from .lm_score import LM_SCORE_ORACLE

    return f"""
WITH bm_raw AS (SELECT * FROM ({bm25_oracle_sql()})),
bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm25
  FROM bm_raw
),
lm_raw AS (SELECT * FROM ({LM_SCORE_ORACLE})),
lmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY mean_surprisal ASC, doc_id) AS rank_lm
  FROM lm_raw
  QUALIFY rank_lm <= {RRF_DEPTH}
),
fused AS (
  SELECT coalesce(bm.doc_id, lmr.doc_id) AS doc_id, rank_bm25, rank_lm,
         round(coalesce(1.0 / ({RRF_K} + rank_bm25), 0.0)
               + coalesce(1.0 / ({RRF_K} + rank_lm), 0.0), 6) AS rrf
  FROM bm FULL OUTER JOIN lmr ON bm.doc_id = lmr.doc_id
)
SELECT doc_id, rank_bm25, rank_lm, rrf,
       row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
FROM fused
"""
