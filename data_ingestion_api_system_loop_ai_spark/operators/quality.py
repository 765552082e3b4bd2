"""Repetition-based document quality filtering (Gopher-style rules).

Web-scale corpora are dominated by boilerplate and degenerate
repetition; the standard heuristics (the Gopher / MassiveText filter
battery) score each document on repetition and shape statistics and
drop the tail. This module computes the battery as pure JVM
expressions — no Python in the hot path — and emits the per-doc
verdict alongside the metrics so downstream stages can re-threshold
without recomputing:

- ``n_tokens``        word count
- ``top_token_frac``  occurrences of the most frequent token / n_tokens
                      (degenerate docs repeat one token)
- ``dup_2gram_frac``  1 - distinct 2-grams / total 2-grams (with
                      multiplicity — repeated phrasing)
- ``mean_token_len``  characters per token (gibberish and markup skew
                      this far from natural text)
- ``keep``            the conjunction of the threshold rules

Scale design: the per-token counting is ONE explode + two-stage
aggregation (groupBy (doc, token) then groupBy doc) — map-side partial
aggregation applies to both, and the shuffle key (doc_id, token) is
near-unique so there is no skew; the 2-gram statistics never leave the
row (array expressions inside whole-stage codegen). Thresholds are
calibrated to the synthetic corpus (top_token_frac p90 ~= 0.14,
dup_2gram_frac p90 ~= 0.065) so both verdicts occur; production values
(Rae et al. 2021, table A1) differ only in the constants.

The reference (an ingestion API) has no quality surface; this module
belongs to the mandated LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokenize
from ..sources.loader import load_table

MIN_TOKENS = 10
MAX_TOP_TOKEN_FRAC = 0.15
MAX_DUP_2GRAM_FRAC = 0.05
MIN_MEAN_TOKEN_LEN, MAX_MEAN_TOKEN_LEN = 3.0, 10.0


def _grams2(tokens: Column) -> Column:
    """2-grams WITH multiplicity (repetition is the signal — the
    distinct form used by the dedup family would erase it). Guarded for
    <2 tokens: Spark's ``sequence(1, 0)`` counts DOWN ([1, 0]), so the
    unguarded form would fabricate grams for empty docs."""
    return F.when(
        F.size(tokens) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tokens, i), F.element_at(tokens, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def quality_profile(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition/shape metrics + keep verdict over any
    (key, text) relation."""
    # LET BINDING (the _shingle_sets idiom, operators/dedup.py:234):
    # naive ``_grams2(tokenize(text))`` re-tokenizes once per element —
    # CollapseProject inlines the alias into every element_at inside the
    # HOF lambda, outside codegen's subexpression elimination. Wrapping
    # the tokenized array in a 1-element array and transforming over it
    # makes ``ts`` a lambda VARIABLE: tokenize runs once per struct
    # evaluation, O(n) total instead of O(n^2) regex splits per doc
    # (the unbound form benched 19 s at sf0.1; this one ~1 s).
    toks = tokenize(F.col(text_col))
    g = F.element_at(
        F.transform(
            F.array(toks),
            lambda ts: F.struct(
                ts.alias("tokens"),
                F.size(_grams2(ts)).cast("long").alias("n_2grams"),
                F.size(F.array_distinct(_grams2(ts)))
                .cast("long")
                .alias("n_2grams_d"),
            ),
        ),
        1,
    )
    base = df.select(F.col(key_col).alias("doc_id"), g.alias("g")).select(
        "doc_id",
        F.col("g.tokens").alias("tokens"),
        F.col("g.n_2grams").alias("n_2grams"),
        F.col("g.n_2grams_d").alias("n_2grams_d"),
    )
    counted = (
        base.select("doc_id", F.explode("tokens").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.max("cnt").cast("long").alias("top_cnt"),
            F.sum(F.col("cnt") * F.length("t")).cast("long").alias("tot_len"),
        )
    )
    top_frac = F.round(F.col("top_cnt") / F.col("n_tokens"), 6)
    dup2 = F.round(
        1 - F.col("n_2grams_d") / F.greatest(F.col("n_2grams"), F.lit(1)), 6
    )
    mean_len = F.round(F.col("tot_len") / F.col("n_tokens"), 6)
    return (
        base.drop("tokens")
        .join(counted, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            top_frac.alias("top_token_frac"),
            dup2.alias("dup_2gram_frac"),
            mean_len.alias("mean_token_len"),
            (
                (F.col("n_tokens") >= MIN_TOKENS)
                & (top_frac < MAX_TOP_TOKEN_FRAC)
                & (dup2 < MAX_DUP_2GRAM_FRAC)
                & mean_len.between(MIN_MEAN_TOKEN_LEN, MAX_MEAN_TOKEN_LEN)
            ).alias("keep"),
        )
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score the ``documents`` corpus. Docs with no tokens at
    all drop out (inner join on the token aggregate): a token-less doc
    is unkeepable by definition and the reference corpus has none."""
    return quality_profile(load_table(spark, sf_dir, "documents"))


_G2 = "tokens[i] || ' ' || tokens[i+1]"

QUALITY_ORACLES = {
    "q_quality_filter": f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS tokens FROM documents
),
base AS (
  SELECT doc_id,
         CAST(greatest(len(tokens) - 1, 0) AS BIGINT) AS n_2grams,
         CAST(len(list_distinct(list_transform(
           range(1, greatest(len(tokens) - 1, 0) + 1), i -> {_G2})))
           AS BIGINT) AS n_2grams_d
  FROM toks
),
tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks),
tc AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY doc_id, t),
counted AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(max(cnt) AS BIGINT) AS top_cnt,
         CAST(sum(cnt * len(t)) AS BIGINT) AS tot_len
  FROM tc GROUP BY doc_id
)
SELECT base.doc_id, n_tokens,
       round(top_cnt * 1.0 / n_tokens, 6) AS top_token_frac,
       round(1 - n_2grams_d * 1.0 / greatest(n_2grams, 1), 6) AS dup_2gram_frac,
       round(tot_len * 1.0 / n_tokens, 6) AS mean_token_len,
       (n_tokens >= {MIN_TOKENS}
        AND round(top_cnt * 1.0 / n_tokens, 6) < {MAX_TOP_TOKEN_FRAC}
        AND round(1 - n_2grams_d * 1.0 / greatest(n_2grams, 1), 6)
              < {MAX_DUP_2GRAM_FRAC}
        AND round(tot_len * 1.0 / n_tokens, 6)
              BETWEEN {MIN_MEAN_TOKEN_LEN} AND {MAX_MEAN_TOKEN_LEN}) AS keep
FROM base JOIN counted ON base.doc_id = counted.doc_id
""",
}

QUALITY_QUERIES = {
    "q_quality_filter": q_quality_filter,
}


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (the MassiveText/RefinedWeb family's
# binary-level repetitiveness proxy): highly repetitive or templated
# text compresses far below prose, and pure gibberish barely compresses
# at all — a cheap single-pass signal the token-level battery above
# cannot see (it operates below tokenization). DEFLATE is not
# expressible in SQL, so this is a sanctioned Python stage: an
# Arrow-batched pandas UDF (never row-at-a-time), deterministic because
# zlib level 6 output is a pure function of the bytes. No DuckDB twin —
# the direct test pins the UDF against an in-process zlib model on
# every document plus hand-built extremes (repetition compresses below
# the keep band, random hex sits above prose).
# ---------------------------------------------------------------------------

COMPRESS_LEVEL = 6
# keep band for DEFLATE bytes-out/bytes-in on ~400-char docs: below =
# template/repetition, above = noise (synthetic-corpus-calibrated;
# production recalibrates per corpus like the Gopher thresholds above)
COMPRESS_KEEP_LO = 0.30
COMPRESS_KEEP_HI = 0.90


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, compress_ratio, keep) over
    ``documents``. (Unregistered, NON-SQL-EXPRESSIBLE — DEFLATE; the
    direct test replays zlib in-process over every doc.)"""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # non-decorator form: `from __future__ import annotations`
    # stringifies hints, which pandas_udf's inference rejects
    def _ratio(texts):
        import zlib

        raw = texts.str.encode("utf-8")
        nb = raw.str.len()
        nc = raw.map(lambda b: len(zlib.compress(b, COMPRESS_LEVEL)))
        return pd.DataFrame({"n_bytes": nb, "n_compressed": nc})

    ratio_udf = F.pandas_udf(
        _ratio, "n_bytes long, n_compressed long"
    )
    r = F.col("_c.n_compressed") / F.col("_c.n_bytes")
    return (
        docs.withColumn("_c", ratio_udf(F.col("text")))
        .select(
            "doc_id",
            F.col("_c.n_bytes").alias("n_bytes"),
            F.col("_c.n_compressed").alias("n_compressed"),
            F.round(r, 6).alias("compress_ratio"),
            (
                (r >= F.lit(COMPRESS_KEEP_LO)) & (r <= F.lit(COMPRESS_KEEP_HI))
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition-loop detection — the degenerate-text signal the Gopher
# battery's global dup-2gram fraction can miss: a document that ENDS in
# "... the cat the cat the cat" (model-generated loops, boilerplate
# stutters, OCR echo). For each period p in [1, LOOP_MAX_PERIOD], the
# trailing match length m_p = length of the maximal suffix where
# token[i] == token[i-p]; the doc's loop is the (period, repeats)
# maximizing repeats (ties -> shortest period). Pure per-row array
# math over the let-bound token array — shuffle-free, one projection;
# the per-period relation explodes only LOOP_MAX_PERIOD rows per doc.
# ---------------------------------------------------------------------------

LOOP_MAX_PERIOD = 8


def q_repetition_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, period, n_repeats, tail_frac): the strongest trailing
    token loop per document — n_repeats >= 2 means the suffix really
    repeats; tail_frac is the fraction of the document the loop
    covers. (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    constructed-loop goldens in tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    )
    d = (
        docs.select("doc_id", "toks", F.size("toks").alias("n"))
        .filter(F.col("n") > 0)
        .withColumn(
            "p", F.explode(F.sequence(F.lit(1), F.lit(LOOP_MAX_PERIOD)))
        )
        .filter(F.col("n") > F.col("p"))
    )
    # m = trailing match length for period p: first j (1-based, from
    # the end) where toks[n+1-j] != toks[n+1-j-p]; none -> n-p
    m = F.expr(
        """CASE WHEN array_position(
             transform(sequence(1, n - p),
                       j -> element_at(toks, n + 1 - j)
                            = element_at(toks, n + 1 - j - p)), false) = 0
           THEN n - p
           ELSE array_position(
             transform(sequence(1, n - p),
                       j -> element_at(toks, n + 1 - j)
                            = element_at(toks, n + 1 - j - p)), false) - 1
           END"""
    )
    per_p = d.select(
        "doc_id", "n", "p", m.alias("m")
    ).select(
        "doc_id", "n", "p", "m",
        (F.floor(F.col("m") / F.col("p")) + 1).cast("long").alias("reps"),
    )
    best = (
        per_p.groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.col("reps"), (-F.col("p")).alias("negp"),
                    F.col("p"), F.col("m"), F.col("n"),
                )
            ).alias("b")
        )
    )
    return best.select(
        "doc_id",
        F.col("b.p").cast("int").alias("period"),
        F.col("b.reps").alias("n_repeats"),
        F.round(
            F.least(F.col("b.m") + F.col("b.p"), F.col("b.n")) / F.col("b.n"),
            6,
        ).alias("tail_frac"),
    )


REPETITION_LOOPS_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
),
d AS (
  SELECT doc_id, toks, len(toks) AS n, p
  FROM docs, unnest(range(1, {LOOP_MAX_PERIOD} + 1)) AS g(p)
  WHERE len(toks) > p
),
per_p AS (
  SELECT doc_id, n, p,
         CASE WHEN list_position(
                list_transform(range(1, n - p + 1),
                               j -> toks[n + 1 - j] = toks[n + 1 - j - p]),
                false) IS NULL
              THEN n - p
              ELSE list_position(
                list_transform(range(1, n - p + 1),
                               j -> toks[n + 1 - j] = toks[n + 1 - j - p]),
                false) - 1
         END AS m
  FROM d
),
scored AS (
  SELECT doc_id, n, p, m, m // p + 1 AS reps FROM per_p
)
SELECT doc_id, period, n_repeats, tail_frac FROM (
  SELECT doc_id, CAST(p AS INTEGER) AS period,
         CAST(reps AS BIGINT) AS n_repeats,
         round(CAST(least(m + p, n) AS DOUBLE) / n, 6) AS tail_frac,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY reps DESC, p ASC) AS rn
  FROM scored
) WHERE rn = 1
"""
