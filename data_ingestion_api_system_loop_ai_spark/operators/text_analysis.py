"""Text-analysis operators over the ``documents`` table (SURVEY.md B16 +
the training-data-pipeline extensions: language-ID, quality scoring,
token counting, document fingerprinting).

All tokenization/hashing is built from JVM-side expressions with exact
DuckDB twins (see ``functions/text.py``), so every query here is
hash-checkable against the oracle. No Python in the hot path.

Scale notes: everything is per-document (narrow) except the word-count
groupBy, which partial-aggregates map-side; the SimHash vote aggregation
shuffles (doc_id, bit) pairs — 32 rows per distinct (doc, token), still
linear in corpus size and key-balanced by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import (
    SIMHASH_BITS,
    STOPWORDS,
    sql_simhash_cte,
    sql_tokens,
    stopword_hits,
    token_hash,
    tokenize,
)
from ..sources.loader import load_table


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.withColumn("tokens", tokenize(F.col("text")))


_SQL_TOKS = f"""
WITH toks AS (
  SELECT doc_id, lang, source, n_chars, {sql_tokens('text')} AS tokens
  FROM documents
)
"""


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 — top-10 tokens per language by frequency (tokenize ->
    explode -> count -> windowed top-k)."""
    t = _docs_tokens(spark, sf_dir)
    counts = (
        t.select("lang", F.explode("tokens").alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring in one per-doc projection:
    whitespace-word tokens, a BPE-ish regex count (letter runs / digit
    runs / other non-space marks), and the length/stopword-ratio
    heuristics of a C4/Gopher-style quality filter (ratio columns NULL
    for token-less docs). One scan, all JVM expressions. Standalone API
    form; the same columns are hash-checked inside ``q_text_profile``
    (registry capped at 50) with a parity test in
    ``tests/test_unregistered_ops.py``."""
    d = _docs_tokens(spark, sf_dir)
    bpe_ish = F.size(
        F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")
    )
    n_tokens = F.size("tokens")
    stop_hits = stopword_hits(F.col("tokens"), STOPWORDS["en"])
    nonzero = n_tokens > 0
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        bpe_ish.alias("n_bpe_ish"),
        F.length("text").alias("n_chars_actual"),
        stop_hits.alias("stop_hits"),
        F.when(nonzero, F.round(stop_hits / n_tokens, 6)).alias("stopword_ratio"),
        F.when(
            nonzero,
            F.round(
                F.least(F.lit(1.0), n_tokens / F.lit(100.0))
                * (1 - stop_hits / n_tokens),
                6,
            ),
        ).alias("quality"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword-ratio heuristics — the deterministic
    core of a C4/Gopher-style quality filter. Standalone API form; the
    same columns are hash-checked inside ``q_token_count`` (registry
    capped at 50) with a direct parity test in
    ``tests/test_unregistered_ops.py``."""
    d = _docs_tokens(spark, sf_dir)
    n_tokens = F.size("tokens")
    stop_hits = stopword_hits(F.col("tokens"), STOPWORDS["en"])
    stop_ratio = F.round(stop_hits / n_tokens, 6)
    quality = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (1 - stop_hits / n_tokens), 6
    )
    return d.filter(n_tokens > 0).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-list voting with a fixed tie order
    (en > fr > es > de); emits per-language scores + the argmax.
    Standalone API form; the same expressions are hash-checked inside
    ``q_text_profile`` (s_en rides as ``stop_hits``) with a parity test
    in ``tests/test_unregistered_ops.py``."""
    d = _docs_tokens(spark, sf_dir)
    scores = {lang: stopword_hits(F.col("tokens"), ws) for lang, ws in STOPWORDS.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"]),
            "en",
        )
        .when((scores["fr"] >= scores["es"]) & (scores["fr"] >= scores["de"]), "fr")
        .when(scores["es"] >= scores["de"], "es")
        .otherwise("de")
    )
    return d.select(
        "doc_id",
        "lang",
        scores["en"].alias("s_en"),
        scores["fr"].alias("s_fr"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
        pred.alias("predicted_lang"),
    )


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused per-document text profile: the token/quality counters of
    ``q_token_count`` AND the stopword-vote language ID of ``q_lang_id``
    in ONE scan (they tokenize the same column; fusing them freed a
    registry slot for the correlated-subquery TPC-H shape, VERDICT r02
    #8 — both standalone forms remain API surface with parity tests in
    ``tests/test_unregistered_ops.py``)."""
    d = _docs_tokens(spark, sf_dir)
    bpe_ish = F.size(
        F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")
    )
    n_tokens = F.size("tokens")
    scores = {lang: stopword_hits(F.col("tokens"), ws) for lang, ws in STOPWORDS.items()}
    stop_hits = scores["en"]
    nonzero = n_tokens > 0
    pred = (
        F.when(
            (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"]),
            "en",
        )
        .when((scores["fr"] >= scores["es"]) & (scores["fr"] >= scores["de"]), "fr")
        .when(scores["es"] >= scores["de"], "es")
        .otherwise("de")
    )
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        bpe_ish.alias("n_bpe_ish"),
        F.length("text").alias("n_chars_actual"),
        stop_hits.alias("stop_hits"),
        F.when(nonzero, F.round(stop_hits / n_tokens, 6)).alias("stopword_ratio"),
        F.when(
            nonzero,
            F.round(
                F.least(F.lit(1.0), n_tokens / F.lit(100.0))
                * (1 - stop_hits / n_tokens),
                6,
            ),
        ).alias("quality"),
        scores["fr"].alias("s_fr"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
        pred.alias("predicted_lang"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct token set
    (set fingerprint) + a 60-bit SimHash (weighted bit votes over
    md5-derived token hashes) — both engine-portable and oracle-exact.
    60 bits (vs the 32-bit first cut) keeps the pigeonhole bands of
    q_dedup_simhash selective at corpus scale while still fitting a
    signed BIGINT on both engines.

    The 60 per-bit votes are 60 columnar ``sum`` aggregates inside ONE
    ``groupBy(doc_id)`` (bit extraction is ``(h >> b) & 1`` in codegen),
    not an exploded (doc, token, bit) relation — an earlier draft
    shuffled 32x the token rows for the same result."""
    t = _docs_tokens(spark, sf_dir)
    tok_counts = (
        t.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", token_hash(F.col("token")))
    )
    vote_cols = [
        F.sum(
            F.when(
                F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")
            ).otherwise(-F.col("cnt"))
        ).alias(f"_v{b}")
        for b in range(SIMHASH_BITS)
    ]
    simhash_expr = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash_expr = term if simhash_expr is None else simhash_expr + term
    # the (doc_id, token) relation is already distinct per token, so the
    # set fingerprint rides the SAME doc rollup as the bit votes — one
    # scan, two aggregations, no second tokenize pass and no join
    return (
        tok_counts.groupBy("doc_id")
        .agg(
            *vote_cols,
            F.md5(F.concat_ws(" ", F.array_sort(F.collect_set("token")))).alias(
                "fingerprint"
            ),
        )
        .select("doc_id", "fingerprint", simhash_expr.cast("long").alias("simhash"))
    )


TEXT_QUERIES = {
    # q_token_count and q_lang_id are hash-checked INSIDE q_text_profile
    # (same expressions, one scan) and pinned by direct parity tests —
    # their slots fund q_tpch_q17 under the driver's 50-row cap.
    # q_doc_fingerprint's slot funds q_sequence_pack: its SimHash
    # subplan is still hash-checked inside q_dedup_simhash every round,
    # and the full query keeps a direct DuckDB parity test
    # (tests/test_unregistered_ops.py) against DOC_FINGERPRINT_ORACLE.
    # Round-8 second rotation: q_text_analysis funded q_kn_score — its
    # per-group windowed top-k idiom stays hash-checked inside the
    # registered q_analytic_funcs (same row_number-over-ordered-window
    # shape) and the full query keeps the driver-grade parity test in
    # tests/test_unregistered_ops.py.
    "q_text_profile": q_text_profile,
}

_EN = "', '".join(STOPWORDS["en"])
_FR = "', '".join(STOPWORDS["fr"])
_ES = "', '".join(STOPWORDS["es"])
_DE = "', '".join(STOPWORDS["de"])

UNREGISTERED_TEXT_QUERIES = {"q_text_analysis": q_text_analysis}
UNREGISTERED_TEXT_ORACLES = {
    "q_text_analysis": _SQL_TOKS
    + """
, counts AS (
  SELECT lang, unnest(tokens) AS token FROM toks
), agg AS (
  SELECT lang, token, count(*) AS n FROM counts GROUP BY lang, token
)
SELECT lang, token, n, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk FROM agg
) WHERE rnk <= 10
""",
}

TEXT_ORACLES = {
    "q_text_profile": _SQL_TOKS
    + f"""
, scored AS (
  SELECT doc_id, toks.lang AS lang,
         CAST(len(tokens) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(tokens)) AS INTEGER) AS n_distinct,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS INTEGER) AS n_bpe_ish,
         CAST(length(text) AS INTEGER) AS n_chars_actual,
         CAST(len(list_filter(tokens, t -> t IN ('{_EN}'))) AS INTEGER) AS stop_hits,
         CAST(len(list_filter(tokens, t -> t IN ('{_FR}'))) AS INTEGER) AS s_fr,
         CAST(len(list_filter(tokens, t -> t IN ('{_ES}'))) AS INTEGER) AS s_es,
         CAST(len(list_filter(tokens, t -> t IN ('{_DE}'))) AS INTEGER) AS s_de
  FROM toks JOIN documents USING (doc_id)
)
SELECT doc_id, lang, n_tokens, n_distinct, n_bpe_ish, n_chars_actual, stop_hits,
       CASE WHEN n_tokens > 0
            THEN round(stop_hits * 1.0 / n_tokens, 6) END AS stopword_ratio,
       CASE WHEN n_tokens > 0
            THEN round(least(1.0, n_tokens / 100.0) * (1 - stop_hits * 1.0 / n_tokens), 6)
       END AS quality,
       s_fr, s_es, s_de,
       CASE WHEN stop_hits >= s_fr AND stop_hits >= s_es AND stop_hits >= s_de THEN 'en'
            WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS predicted_lang
FROM scored
""",
}

# Unregistered (slot funds q_sequence_pack) but still oracle-exact: the
# direct parity test in tests/test_unregistered_ops.py runs this.
DOC_FINGERPRINT_ORACLE = (
    sql_simhash_cte()
    + """
, fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS fingerprint
  FROM toks
)
SELECT fp.doc_id, fingerprint, simhash FROM fp JOIN sh ON fp.doc_id = sh.doc_id
"""
)


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps' law audit) — how the distinct-token
# vocabulary grows as the corpus accumulates: the curve every tokenizer
# sizing / dedup-health review reads (sub-linear growth is healthy;
# near-linear growth means unbounded noise vocabulary — OCR garbage,
# ids, boilerplate explosions). Checkpoints are VALUE-bucKeted doc_id
# deciles off a 1-row broadcast min/max — no global sort, no ntile
# single-partition window; each token contributes once at its FIRST
# decile (min doc_id), and the 10-row cumulative walk is driver-trivial.
# ---------------------------------------------------------------------------

VOCAB_DECILES = 10


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, cum_docs, cum_token_instances, vocab): cumulative
    document count, token instances, and DISTINCT vocabulary after
    each doc_id-value decile of ``documents``. (Unregistered — 50-slot
    cap; driver-grade DuckDB parity + monotone-growth/final-total
    invariants in tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    )
    stats = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    dec = F.least(
        F.lit(VOCAB_DECILES),
        (
            (F.col("doc_id") - F.col("mn"))
            * VOCAB_DECILES
            / (F.col("mx") - F.col("mn") + 1)
        ).cast("long")
        + 1,
    )
    d = docs.crossJoin(F.broadcast(stats)).select(
        "doc_id", "toks", dec.alias("decile")
    )
    per_doc = d.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("n_tok"),
    )
    firsts = (
        d.select("decile", F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.min("decile").alias("fdec"))
        .groupBy("fdec")
        .agg(F.count("*").alias("new_vocab"))
    )
    from pyspark.sql.window import Window as W

    run = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per_doc.join(
            firsts.withColumnRenamed("fdec", "decile"), "decile", "left"
        )
        .select(
            "decile",
            F.sum("n_docs").over(run).cast("long").alias("cum_docs"),
            F.sum("n_tok").over(run).cast("long").alias("cum_token_instances"),
            F.sum(F.coalesce("new_vocab", F.lit(0)))
            .over(run)
            .cast("long")
            .alias("vocab"),
        )
        .orderBy("decile")
    )


VOCAB_GROWTH_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
),
stats AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM docs),
d AS (
  SELECT doc_id, toks,
         least({VOCAB_DECILES},
               (doc_id - mn) * {VOCAB_DECILES} // (mx - mn + 1) + 1) AS decile
  FROM docs, stats
),
per_doc AS (
  SELECT decile, count(*) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS n_tok
  FROM d GROUP BY decile
),
firsts AS (
  SELECT fdec AS decile, count(*) AS new_vocab FROM (
    SELECT t, min(decile) AS fdec
    FROM (SELECT decile, unnest(toks) AS t FROM d) GROUP BY t
  ) GROUP BY fdec
)
SELECT decile,
       CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
       CAST(sum(n_tok) OVER w AS BIGINT) AS cum_token_instances,
       CAST(sum(coalesce(new_vocab, 0)) OVER w AS BIGINT) AS vocab
FROM per_doc LEFT JOIN firsts USING (decile)
WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Zipf-law fit (Zipf 1949; the modern treatment is Piantadosi 2014,
# "Zipf's word frequency law in natural language") — the corpus-health
# twin of B96's Heaps-law vocabulary curve: natural-language token
# frequencies fall on log(freq) ~ -s * log(rank) with s near 1;
# machine-generated or template-heavy corpora bend the curve (s drifts,
# r^2 collapses). One number pair per corpus, read before the
# quality/dedup battery is tuned.
#
# Shape: the trained unigram relation ranks by (cnt DESC, token) via
# the two-phase ``global_row_number`` (bucket key = -cnt, a leading
# prefix of the order — never a single-partition sort over the
# vocabulary); the least-squares slope/r^2 come from six
# decimal-summed moments of (ln rank, ln cnt) — each term rounded to
# 12 dp then summed exactly, so the fit is order-independent and
# engine-identical.
# ---------------------------------------------------------------------------


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (v, n_tokens, zipf_slope, r2) over ``documents``.
    (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    power-law/degenerate fixtures in tests/test_unregistered_ops.py.)"""
    from ..plans.ranking import global_row_number
    from .lm_score import unigram_counts

    docs = load_table(spark, sf_dir, "documents").select("text")
    freq = unigram_counts(docs).localCheckpoint(eager=False)
    ranked = global_row_number(
        freq.withColumn("_negc", -F.col("cnt")),
        ["_negc"],
        ["token"],
        rn_col="rank",
    )
    dec12 = lambda c: F.round(c, 12).cast("decimal(25,12)")  # noqa: E731
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    m = ranked.agg(
        F.count("*").cast("long").alias("v"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(dec12(x)).cast("double").alias("sx"),
        F.sum(dec12(y)).cast("double").alias("sy"),
        F.sum(dec12(x * y)).cast("double").alias("sxy"),
        F.sum(dec12(x * x)).cast("double").alias("sxx"),
        F.sum(dec12(y * y)).cast("double").alias("syy"),
    )
    n = F.col("v").cast("double")
    cxy = n * F.col("sxy") - F.col("sx") * F.col("sy")
    cxx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    cyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "v",
        "n_tokens",
        F.round(cxy / cxx, 6).alias("zipf_slope"),
        F.round(cxy * cxy / (cxx * cyy), 6).alias("r2"),
    )


ZIPF_FIT_ORACLE = f"""
WITH toks AS (
  SELECT {sql_tokens('text')} AS ts FROM documents
),
ex AS (SELECT unnest(ts) AS token FROM toks),
freq AS (SELECT token, count(*) AS cnt FROM ex GROUP BY token),
ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, token) AS rank
  FROM freq
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(sum(CAST(round(ln(CAST(rank AS DOUBLE)), 12)
                       AS DECIMAL(25,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE)), 12)
                       AS DECIMAL(25,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(ln(CAST(rank AS DOUBLE))
                             * ln(CAST(cnt AS DOUBLE)), 12)
                       AS DECIMAL(25,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(round(ln(CAST(rank AS DOUBLE))
                             * ln(CAST(rank AS DOUBLE)), 12)
                       AS DECIMAL(25,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE))
                             * ln(CAST(cnt AS DOUBLE)), 12)
                       AS DECIMAL(25,12))) AS DOUBLE) AS syy
  FROM ranked
)
SELECT v, n_tokens,
       round((v * sxy - sx * sy) / (v * sxx - sx * sx), 6) AS zipf_slope,
       round((v * sxy - sx * sy) * (v * sxy - sx * sy)
             / ((v * sxx - sx * sx) * (v * syy - sy * sy)), 6) AS r2
FROM m
"""

UNREGISTERED_TEXT_QUERIES["q_zipf_fit"] = q_zipf_fit
UNREGISTERED_TEXT_ORACLES["q_zipf_fit"] = ZIPF_FIT_ORACLE


# ---------------------------------------------------------------------------
# Token burstiness (Church & Gale 1995, "Poisson mixtures"; Katz 1996)
# — the topicality statistic: under random scatter, a token with total
# count c lands in E[df] = D * (1 - (1 - 1/D)^c) distinct documents
# (binomial occupancy over D docs); real content words BURST — they
# concentrate in far fewer documents than chance (df << E[df]) while
# function words match the Poisson line. In a training-data pipeline
# the bursty tail separates topical vocabulary from boilerplate/
# function tokens — the signal behind df-cutoff choices and tf-idf's
# very existence, made explicit per token.
#
# One exploded (token) aggregate computes cnt AND df together (a single
# corpus shuffle); D is a 1-row column-pruned count. The top-k most
# bursty tokens (lowest df/E[df], count floor applied) come back via
# TakeOrderedAndProject on the ROUNDED ratio with a token tiebreak.
# ---------------------------------------------------------------------------

BURST_MIN_CNT = 50
BURST_TOPK = 25


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, cnt, df, expected_df, burstiness, burst_rank) — the
    BURST_TOPK most-bursty tokens with cnt >= BURST_MIN_CNT.
    (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    constructed bursty/uniform fixture in
    tests/test_unregistered_ops.py.)"""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("token"))
    stats = ex.groupBy("token").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("doc_id").alias("df"),
    )
    n_docs = d.agg(F.count("*").alias("D"))
    exp_df = F.col("D") * (
        F.lit(1.0)
        - F.pow(
            (F.col("D") - F.lit(1.0)) / F.col("D"), F.col("cnt").cast("double")
        )
    )
    scored = (
        stats.filter(F.col("cnt") >= BURST_MIN_CNT)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("df").cast("long").alias("df"),
            F.round(exp_df, 6).alias("expected_df"),
            F.round(F.col("df") / exp_df, 6).alias("burstiness"),
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    # heap of BURST_TOPK rows, never a global sort of the whole
    # cnt>=BURST_MIN_CNT vocabulary (a bare row_number over an
    # unpartitioned Window would single-partition-sort it; WindowGroupLimit
    # only bounds the input volume, it does not remove the sort). The
    # rank window then runs over exactly BURST_TOPK rows.
    top = scored.orderBy(F.col("burstiness"), F.col("token")).limit(BURST_TOPK)
    w = W.orderBy(F.col("burstiness"), F.col("token"))
    return top.withColumn(
        "burst_rank", F.row_number().over(w).cast("long")
    )


BURSTINESS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS ts FROM documents
),
ex AS (SELECT doc_id, unnest(ts) AS token FROM toks),
stats AS (
  SELECT token, count(*) AS cnt, count(DISTINCT doc_id) AS df
  FROM ex GROUP BY token
),
nd AS (SELECT count(*) AS D FROM documents),
scored AS (
  SELECT token,
         CAST(cnt AS BIGINT) AS cnt,
         CAST(df AS BIGINT) AS df,
         round(D * (1.0 - pow(CAST(D - 1 AS DOUBLE) / D, CAST(cnt AS DOUBLE))), 6)
           AS expected_df,
         round(df / (D * (1.0 - pow(CAST(D - 1 AS DOUBLE) / D, CAST(cnt AS DOUBLE)))), 6)
           AS burstiness
  FROM stats CROSS JOIN nd
  WHERE cnt >= {BURST_MIN_CNT}
)
SELECT token, cnt, df, expected_df, burstiness,
       CAST(burst_rank AS BIGINT) AS burst_rank
FROM (
  SELECT *, row_number() OVER (ORDER BY burstiness, token) AS burst_rank
  FROM scored
) WHERE burst_rank <= {BURST_TOPK}
"""

UNREGISTERED_TEXT_QUERIES["q_burstiness"] = q_burstiness
UNREGISTERED_TEXT_ORACLES["q_burstiness"] = BURSTINESS_ORACLE


# ---------------------------------------------------------------------------
# Readability indices (round 9) — Flesch Reading Ease (Flesch 1948),
# Flesch-Kincaid Grade Level (Kincaid et al. 1975), Automated
# Readability Index (Senter & Smith 1967), Coleman-Liau (Coleman & Liau
# 1975): the published per-document complexity battery a curation
# pipeline reads beside the Gopher heuristics — too-low grade is
# boilerplate/listicle, too-high is OCR garbage or formulae.
#
# Every count is an exact JVM expression with a DuckDB twin:
# sentences = non-empty [.!?]+ segments containing a letter/digit
# (floor 1), words = the shared tokenize, syllables = vowel-GROUP runs
# per token (floor 1/token — the standard heuristic), letters = token
# lengths. The four index formulas are identical double trees on both
# engines, rounded 6 dp. Per-document narrow projection — zero
# shuffles, scales by definition.
# ---------------------------------------------------------------------------

_VOWEL_RUNS = "[aeiouy]+"
_SENT_SPLIT = "[.!?]+"


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_sentences, n_words, n_syllables, n_letters,
    flesch_ease, fk_grade, ari, coleman_liau) for every doc with >= 1
    token. (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    hand-computed fixtures in tests/test_unregistered_ops.py.)"""
    d = load_table(spark, sf_dir, "documents")
    ts = tokenize(F.col("text"))
    sents = F.greatest(
        F.lit(1),
        F.size(
            F.filter(
                F.split(F.col("text"), _SENT_SPLIT),
                lambda s: s.rlike("[A-Za-z0-9]"),
            )
        ),
    )
    sylls = F.aggregate(
        F.transform(
            ts,
            lambda t: F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(t, F.lit(_VOWEL_RUNS), 0)),
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    letters = F.aggregate(
        F.transform(ts, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    base = d.select(
        "doc_id",
        sents.cast("long").alias("n_sentences"),
        F.size(ts).cast("long").alias("n_words"),
        sylls.alias("n_syllables"),
        letters.alias("n_letters"),
    ).filter(F.col("n_words") >= 1)
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    c = F.col("n_letters").cast("double")
    return base.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        "n_letters",
        F.round(
            F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w), 6
        ).alias("flesch_ease"),
        F.round(
            F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59), 6
        ).alias("fk_grade"),
        F.round(
            F.lit(4.71) * (c / w) + F.lit(0.5) * (w / s) - F.lit(21.43), 6
        ).alias("ari"),
        F.round(
            F.lit(0.0588) * (c / w * F.lit(100.0))
            - F.lit(0.296) * (s / w * F.lit(100.0))
            - F.lit(15.8),
            6,
        ).alias("coleman_liau"),
    )


READABILITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         greatest(1, len(list_filter(
           regexp_split_to_array(text, '{_SENT_SPLIT}'),
           s -> regexp_matches(s, '[A-Za-z0-9]')))) AS n_sentences,
         {sql_tokens('text')} AS ts
  FROM documents
),
counted AS (
  SELECT doc_id,
         CAST(n_sentences AS BIGINT) AS n_sentences,
         CAST(len(ts) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(ts,
           t -> greatest(1, len(regexp_extract_all(t, '{_VOWEL_RUNS}'))))), 0)
           AS BIGINT) AS n_syllables,
         CAST(coalesce(list_sum(list_transform(ts, t -> length(t))), 0)
           AS BIGINT) AS n_letters
  FROM base
  WHERE len(ts) >= 1
)
SELECT doc_id, n_sentences, n_words, n_syllables, n_letters,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
         AS flesch_ease,
       round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 6)
         AS fk_grade,
       round(4.71 * (CAST(n_letters AS DOUBLE) / n_words)
             + 0.5 * (CAST(n_words AS DOUBLE) / n_sentences) - 21.43, 6)
         AS ari,
       round(0.0588 * (CAST(n_letters AS DOUBLE) / n_words * 100.0)
             - 0.296 * (CAST(n_sentences AS DOUBLE) / n_words * 100.0)
             - 15.8, 6)
         AS coleman_liau
FROM counted
"""

UNREGISTERED_TEXT_QUERIES["q_readability"] = q_readability
UNREGISTERED_TEXT_ORACLES["q_readability"] = READABILITY_ORACLE


# ---------------------------------------------------------------------------
# Distinct-n diversity (Li et al. 2016, "A Diversity-Promoting
# Objective Function for Neural Conversation Models", NAACL): the
# distinct-1/2/3 ratios — unique n-grams over total n-grams — the
# standard degeneration/diversity audit; a corpus (or a model-generated
# slice of one) whose distinct-2 collapses is loop-ridden even when
# lengths look fine. Per-document narrow arithmetic (array_distinct
# over in-row n-gram arrays), zero shuffles.
# ---------------------------------------------------------------------------


def _ngrams(ts, n: int):
    return F.when(
        F.size(ts) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, distinct_1, distinct_2, distinct_3) — the
    distinct-n ratios per document, NULL where fewer than n tokens
    exist. (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    constructed loop/diverse fixtures in
    tests/test_unregistered_ops.py.)"""
    d = load_table(spark, sf_dir, "documents")
    ts = tokenize(F.col("text"))
    base = d.select("doc_id", ts.alias("ts")).filter(F.size("ts") >= 1)
    cols = [F.col("doc_id"), F.size("ts").cast("long").alias("n_tokens")]
    for n in (1, 2, 3):
        g = _ngrams(F.col("ts"), n)
        cols.append(
            F.when(
                F.size(g) > 0,
                F.round(
                    F.size(F.array_distinct(g)).cast("double") / F.size(g), 6
                ),
            ).alias(f"distinct_{n}")
        )
    return base.select(*cols)


def _sql_ngrams(n: int) -> str:
    if n == 1:
        return "ts"
    joins = " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len(ts) >= {n} THEN "
        f"list_transform(range(1, len(ts) - {n - 2}), i -> {joins}) "
        f"ELSE [] END"
    )


NGRAM_DIVERSITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {sql_tokens('text')} AS ts FROM documents
)
SELECT doc_id,
       CAST(len(ts) AS BIGINT) AS n_tokens,
       CASE WHEN len({_sql_ngrams(1)}) > 0 THEN
         round(CAST(len(list_distinct({_sql_ngrams(1)})) AS DOUBLE)
               / len({_sql_ngrams(1)}), 6) END AS distinct_1,
       CASE WHEN len({_sql_ngrams(2)}) > 0 THEN
         round(CAST(len(list_distinct({_sql_ngrams(2)})) AS DOUBLE)
               / len({_sql_ngrams(2)}), 6) END AS distinct_2,
       CASE WHEN len({_sql_ngrams(3)}) > 0 THEN
         round(CAST(len(list_distinct({_sql_ngrams(3)})) AS DOUBLE)
               / len({_sql_ngrams(3)}), 6) END AS distinct_3
FROM base
WHERE len(ts) >= 1
"""

UNREGISTERED_TEXT_QUERIES["q_ngram_diversity"] = q_ngram_diversity
UNREGISTERED_TEXT_ORACLES["q_ngram_diversity"] = NGRAM_DIVERSITY_ORACLE
