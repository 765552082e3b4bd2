"""Unigram language-model surprisal scoring over ``documents`` — the
CCNet / Gopher "perplexity filter" stage of a training-data pipeline,
with the LM trained on the corpus itself in the same job.

A pretraining pipeline scores every candidate document by how probable
a reference language model finds it; documents with extreme mean
surprisal (gibberish at the high end, degenerate repetition at the low
end) are dropped or re-bucketed (CCNet trains a 5-gram KenLM per
language; the unigram form here keeps the statistics exactly
SQL-expressible while exercising the identical distributed shape:
train = corpus aggregation, score = per-token probability lookup).

Model: add-one-smoothed unigram LM over the corpus token counts —
``p(t) = (count(t) + 1) / (T + V)`` with T total tokens, V vocabulary
size. Per document: ``mean_surprisal = Σ tf(t)·(−ln p(t)) / n_tokens``
(nats/token; the unigram cross-entropy of the doc against the corpus).

Plan shape at 100 TB:

- TRAIN is one map-side-combinable aggregation: explode → count by
  token. Vocabulary is Zipf-bounded (a few million rows even at
  web-corpus scale — OSCAR's is ~10 M) so the trained model is a
  BROADCAST relation, exactly the FastText/KenLM "model file shipped
  to every worker" deployment, expressed relationally.
- SCORE is shuffle-free on the corpus side: per-doc term frequencies
  are computed IN-ROW (``transform`` over the distinct-token array —
  no (doc, token) explode-shuffle), the broadcast join attaches
  counts, and the per-doc sum folds over the token-SORTED contribution
  array so the floating-point order is pinned — the same in-order
  ``list_sum`` contract the similarity family relies on. The only
  corpus shuffle is the final groupBy(doc_id) re-assembly of the
  exploded distinct tokens, whose width is n_distinct ≤ n_tokens.
- The 1-row (T, V) total is a broadcast nested-loop of one row — the
  stats-broadcast idiom shared with q_bm25_rank.

Determinism: ``(count+1)/(T+V)`` is the same long→double division on
both engines, ``-ln`` agrees to the last ulp (absorbed by the 9-digit
compare), the fold order is pinned by ``array_sort``/``ORDER BY tok``,
and the final value rounds to 6 places (house convention).

Reference parity note: the reference (412 LoC Express pipeline) has no
text analytics; this operator belongs to the BASELINE.json north-star
tier (text analysis / quality scoring at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokenize
from ..sources.loader import load_table

# Keep verdict band in nats/token: sub-1.5 means near-degenerate
# repetition of the most common tokens; the high side is gibberish
# (vs this corpus's LM). Both bounds are literals so the oracle
# reproduces the verdict exactly.
LM_LOW = 1.5
LM_HIGH = 6.0


def unigram_counts(docs: DataFrame) -> DataFrame:
    """(token, cnt) corpus counts — the trained model relation."""
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def unigram_totals(freq: DataFrame) -> DataFrame:
    """1-row (T, V) smoothing denominator of the trained LM."""
    return freq.agg(F.sum("cnt").alias("T"), F.count("*").alias("V"))


def lm_scores(
    docs: DataFrame,
    freq: DataFrame | None = None,
    totals: DataFrame | None = None,
) -> DataFrame:
    """Score ``docs(doc_id, text)``: (doc_id, n_tokens, n_distinct,
    mean_surprisal, keep).

    ``freq``/``totals`` default to training on ``docs`` itself (the
    oracle-checked inline form); a persisted model passes its stored
    relations instead (``operators/text_models.py``) and the scoring
    plan below is UNCHANGED — counts are longs and every downstream
    expression is the same tree, so from-model results are bit-identical
    to train-inside results (pinned by test)."""
    if freq is None:
        freq = unigram_counts(docs)
    if totals is None:
        totals = unigram_totals(freq)

    # in-row distinct-token tfs: (doc_id, token, tf, n_tokens) with NO
    # (doc, token) shuffle — the explode below feeds a broadcast join.
    # LET BINDING via F.inline (the bm25_scores idiom): projecting
    # size(_toks) NEXT TO the explode of _tfs lets CollapseProject
    # inline both aliases into the Generate, re-evaluating the whole
    # tokenize + O(distinct*len) tf tree per consumer (the exact
    # double-evaluation that cost q_lm2_score 8.6->2.5 s in r4; here
    # measured 2.1 s -> 0.2 s at sf0.1). Routing the pair through one
    # inline-Generate makes n_tokens/tfs real attributes evaluated
    # exactly once per document.
    packed = F.transform(
        F.array(tokenize(F.col("text"))),
        lambda ts: F.struct(
            F.size(ts).alias("n_tokens"),
            F.transform(
                F.array_sort(F.array_distinct(ts)),
                lambda t: F.struct(
                    t.alias("token"),
                    F.size(F.filter(ts, lambda x: x == t)).alias("tf"),
                ),
            ).alias("tfs"),
        ),
    )
    base = docs.select("doc_id", F.inline(packed))
    per_tok = base.select(
        "doc_id", "n_tokens", F.explode("tfs").alias("e")
    ).select("doc_id", "n_tokens", "e.token", "e.tf")

    contrib = (
        per_tok.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "n_tokens",
            "token",
            (
                F.col("tf")
                * -F.log((F.col("cnt") + F.lit(1)) / (F.col("T") + F.col("V")))
            ).alias("c"),
        )
    )
    per_doc = contrib.groupBy("doc_id", "n_tokens").agg(
        F.count("*").alias("n_distinct"),
        # token-sorted fold: identical summation order on both engines
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("token", "c"))),
                lambda s: s["c"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s"),
    )
    mean = F.round(F.col("s") / F.col("n_tokens"), 6)
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        mean.alias("mean_surprisal"),
        ((mean >= F.lit(LM_LOW)) & (mean <= F.lit(LM_HIGH))).alias("keep"),
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-score unigram LM pass over ``documents``.
    (Unregistered — the registry is at the driver's 50-slot cap;
    driver-grade DuckDB parity + plan test in
    tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return lm_scores(docs)


_TOKS = sql_tokens("text")

LM_SCORE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
),
ex AS (SELECT doc_id, unnest(ts) AS token FROM toks),
freq AS (SELECT token, count(*) AS cnt FROM ex GROUP BY token),
tot AS (SELECT sum(cnt) AS T, count(*) AS V FROM freq),
dt AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY doc_id, token),
contrib AS (
  SELECT doc_id, token,
         tf * -ln((cnt + 1) / (T + V)) AS c
  FROM dt JOIN freq USING (token) CROSS JOIN tot
),
per_doc AS (
  SELECT c.doc_id,
         len(t.ts) AS n_tokens,
         count(*) AS n_distinct,
         list_sum(list(c.c ORDER BY c.token)) AS s
  FROM contrib c JOIN toks t ON c.doc_id = t.doc_id
  GROUP BY c.doc_id, len(t.ts)
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       round(s / n_tokens, 6) AS mean_surprisal,
       round(s / n_tokens, 6) BETWEEN {LM_LOW} AND {LM_HIGH} AS keep
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Bigram LM — conditional surprisal (one order up from the unigram
# stage, one step toward the CCNet/KenLM n-gram filter): score each
# document by the mean add-one-smoothed -ln P(y|x) over its adjacent
# token pairs, P(y|x) = (c_xy + 1) / (c_x + V). The scale difference
# from the unigram stage is honest and documented: the trained bigram
# relation is CORPUS-BIGRAM-bounded, not Zipf-vocabulary-bounded, so
# the scoring join runs as a plain shuffle join on the (x, y) key (the
# sharded-model deployment) rather than a broadcast — AQE still
# broadcasts it while it fits.
# ---------------------------------------------------------------------------


def bigram_marginals(bg: DataFrame) -> DataFrame:
    """(x, c_x) left-marginal counts of the trained bigram relation."""
    return bg.groupBy("x").agg(F.sum("c_xy").alias("c_x"))


def bigram_vocab(bg: DataFrame) -> DataFrame:
    """1-row (V) right-vocabulary size — the add-one denominator."""
    return bg.agg(F.countDistinct("y").alias("V"))


def q_lm2_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, n_distinct_bigrams, mean_surprisal2) over
    ``documents`` — docs with fewer than two tokens drop (no bigrams).
    Per-doc summation casts each contribution to decimal(25,12) so the
    sum is order-independent exactly on both engines. (Unregistered — 50-slot cap; driver-grade DuckDB
    parity + ordering fixture in tests/test_unregistered_ops.py.)"""
    from .collocations import bigram_counts

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # REUSE BARRIER (the _shingle_sets idiom): the trained bigram
    # relation has three consumers (the scoring join, the c_x
    # marginals, the vocabulary count) — without a shared exchange each
    # would re-run the corpus tokenize+pair aggregation; the
    # repartition makes the three subtrees identical up to the
    # exchange, which ReuseExchange collapses to one execution
    bg = bigram_counts(docs.select("text")).repartition(F.col("x"))
    return lm2_scores(docs, bg, bigram_marginals(bg), bigram_vocab(bg))


def lm2_scores(
    docs: DataFrame, bg: DataFrame, cx: DataFrame, v: DataFrame
) -> DataFrame:
    """The bigram scoring plan against a given trained model
    (``bg``/``cx``/``v`` — trained inline by ``q_lm2_score`` or read
    from a persisted model by ``text_models.q_lm2_score_from_model``;
    counts are longs, so both sources score bit-identically)."""
    pairs_arr = F.element_at(
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
    # exploded (doc, x, y) tf aggregation — NOT the unigram stage's
    # in-row tf trick: bigrams are nearly all DISTINCT within a doc, so
    # the in-row filter degenerates to O(n_bigrams^2) struct compares
    # per document (measured 17 s at sf0.1; the in-row form wins only
    # when per-doc term diversity is far below length, as with
    # unigrams). The pairs array is evaluated EXACTLY ONCE per row:
    # n_bigrams is recovered later as sum(tf) instead of a second
    # size(pairs_arr) reference, which CollapseProject would inline as
    # a full re-tokenize+re-pair per row (measured 8.6 s -> 2.5 s).
    per_pair = (
        docs.select("doc_id", F.explode(pairs_arr).alias("p"))
        .groupBy(
            "doc_id", F.col("p.x").alias("x"), F.col("p.y").alias("y")
        )
        .agg(F.count("*").alias("tf"))
    )

    contrib = (
        per_pair.join(bg, ["x", "y"])
        .join(cx, "x")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "tf",
            (
                F.col("tf")
                * -F.log((F.col("c_xy") + 1) / (F.col("c_x") + F.col("V")))
            ).alias("c"),
        )
    )
    # decimal sum instead of the unigram stage's sorted fold: collecting
    # ~n_bigrams (x, y, c) STRING structs per doc for ordering is the
    # dominant cost at scale; casting each contribution to
    # decimal(25,12) makes the sum order-independent exactly (the
    # ivf_centroids precedent), so a plain HashAggregate suffices.
    # n_bigrams = sum(tf) — recovered here rather than carried from a
    # second pairs-array evaluation.
    per_doc = contrib.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
        F.sum(F.col("c").cast("decimal(25,12)")).cast("double").alias("s"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_distinct_bigrams").cast("long").alias("n_distinct_bigrams"),
        F.round(F.col("s") / F.col("n_bigrams"), 6).alias("mean_surprisal2"),
    )


LM2_SCORE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
),
bg_doc AS (
  SELECT doc_id, u.pair['x'] AS x, u.pair['y'] AS y, count(*) AS tf
  FROM toks,
       UNNEST(CASE WHEN len(ts) >= 2 THEN
         list_transform(range(1, len(ts)),
                        i -> {{'x': ts[i], 'y': ts[i+1]}})
         ELSE [] END) AS u(pair)
  GROUP BY 1, 2, 3
),
bg AS (SELECT x, y, sum(tf) AS c_xy FROM bg_doc GROUP BY x, y),
cx AS (SELECT x, sum(c_xy) AS c_x FROM bg GROUP BY x),
v AS (SELECT count(DISTINCT y) AS V FROM bg),
nb AS (
  SELECT doc_id, greatest(len(ts) - 1, 0) AS n_bigrams FROM toks
),
contrib AS (
  SELECT d.doc_id, d.x, d.y,
         d.tf * -ln((b.c_xy + 1) / (c.c_x + v.V)) AS c
  FROM bg_doc d JOIN bg b USING (x, y) JOIN cx c USING (x) CROSS JOIN v
),
per_doc AS (
  SELECT c.doc_id, n.n_bigrams,
         count(*) AS n_distinct_bigrams,
         CAST(sum(CAST(c.c AS DECIMAL(25,12))) AS DOUBLE) AS s
  FROM contrib c JOIN nb n USING (doc_id)
  GROUP BY c.doc_id, n.n_bigrams
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_distinct_bigrams AS BIGINT) AS n_distinct_bigrams,
       round(s / n_bigrams, 6) AS mean_surprisal2
FROM per_doc
"""
