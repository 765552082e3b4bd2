"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus feeding a training run needs splits that are:

- DETERMINISTIC — re-running the pipeline (or re-reading after a
  failure) assigns every document to the same split; no RNG state, no
  ``rand()`` whose draw depends on partitioning;
- KEY-STABLE — a document keeps its split across corpus versions, so
  yesterday's validation document cannot leak into today's training
  set when the corpus grows (the reason splits hash a STABLE KEY, not
  a row position);
- SHUFFLE-FREE — assignment is a per-row projection; nothing moves.

``split_column`` hashes the key with the engine-portable md5 window
(same construction as the MinHash operators, so DuckDB or any other
engine reproduces the assignment bit-for-bit) and buckets the hash into
10_000 slots; split boundaries are cumulative per-mille-of-ten
fractions over those slots. ``deterministic_split`` materializes the
per-split DataFrames; ``deterministic_sample`` is the one-fraction
form. Both are API surface with direct tests (the driver registry is
capped at 50 slots).

The reference has no sampling surface (it is an ingestion API); this
module belongs to the mandated LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_SLOTS = 10_000


def _portable_hash_slot(key: Column) -> Column:
    """Engine-portable slot in [0, SPLIT_SLOTS): first 8 hex chars of
    md5 over the key's string form, mod the slot count. DuckDB twin:
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT % 10000``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % SPLIT_SLOTS
    )


def split_column(
    key: Column | str, fractions: dict[str, float], col_name: str = "split"
) -> Column:
    """A projection column assigning each row to a named split by the
    hash of ``key``. ``fractions`` maps split name -> fraction; they
    must sum to <= 1.0 (any remainder is assigned NULL — useful for
    'sample 1% train / 0.1% val, ignore the rest' pipelines).

    Assignment is by half-open slot ranges over the hashed key, so it
    is stable under corpus growth and identical on every engine that
    can compute md5."""
    if isinstance(key, str):
        key = F.col(key)
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    slot = _portable_hash_slot(key)
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * SPLIT_SLOTS))
        cond = (slot >= lo) & (slot < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr.otherwise(F.lit(None)).alias(col_name)


def deterministic_split(
    df: DataFrame, key: str, fractions: dict[str, float]
) -> dict[str, DataFrame]:
    """Materialize one DataFrame per named split. Each split is a
    filter over the same projection — Catalyst pushes the predicate to
    the scan, and no data moves until an action runs."""
    tagged = df.withColumn("split", split_column(key, fractions))
    return {
        name: tagged.filter(F.col("split") == name).drop("split")
        for name in fractions
    }


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Key-stable fraction sample: the same rows are selected on every
    run and on every engine (unlike ``df.sample``, whose selection
    depends on partition layout and RNG seed plumbing)."""
    return deterministic_split(df, key, {"s": fraction})["s"]


# ---------------------------------------------------------------------------
# Domain-mix resampling & deterministic corpus shuffle
# ---------------------------------------------------------------------------
#
# Two more layout decisions every training pipeline makes:
#
# - DOMAIN MIXING: the raw corpus's domain proportions are never the
#   proportions you train on (The Pile / LLaMA-style mixture weights).
#   ``domain_mix`` downsamples each domain to an integer-rational
#   target fraction with a RANK-STRIDE rule: rows are ranked inside
#   their domain by a seeded portable hash, and row ``r`` is kept iff
#   ``floor(r*num/den) > floor((r-1)*num/den)`` — exactly
#   ``floor(n*num/den)`` survivors per domain, evenly spread across the
#   hash order (a hash-mod filter is lumpy at small n; integer
#   arithmetic keeps both engines bit-identical, no float fractions).
# - CORPUS SHUFFLE: SGD wants documents in pseudo-random order, and the
#   order must be reproducible across reruns and engines. A seeded md5
#   over the key IS the permutation; ranking by it with the two-phase
#   ``global_row_number`` (prefix buckets = the first hash byte) gives
#   every doc its global shuffle position without a single-partition
#   sort — the same scale argument as ``plans/ranking.py``.

from pyspark.sql import SparkSession
from pyspark.sql.window import Window as W

from ..plans.ranking import global_row_number, grouped_row_number
from ..sources.loader import load_table

# lang -> (num, den): downweight the dominant language, keep the rest.
MIX_WEIGHTS: dict[str, tuple[int, int]] = {
    "en": (7, 20),  # 0.35
    "fr": (1, 1),
    "es": (1, 1),
    "de": (1, 1),
    "zh": (4, 5),  # 0.80
}
SHUFFLE_SEED = 42


def _seeded_hex(key: Column, seed: int | str) -> Column:
    """Seeded engine-portable permutation key: md5 over ``seed:key``.
    DuckDB twin: ``md5('<seed>:' || CAST(k AS VARCHAR))``."""
    return F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def _weight_col(
    weights: dict[str, tuple[int, int]], domain_col: str, idx: int, default: int
) -> Column:
    """Literal map lookup: domain -> numerator (idx 0) / denominator
    (idx 1) of its target fraction."""
    pairs = F.create_map(
        *[x for d, w in weights.items() for x in (F.lit(d), F.lit(w[idx]))]
    )
    return F.coalesce(pairs[F.col(domain_col)], F.lit(default))


def domain_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    weights: dict[str, tuple[int, int]],
    seed: int | str = SHUFFLE_SEED,
    rank_col: str = "rank_in_domain",
) -> DataFrame:
    """Resample ``df`` to the target per-domain mixture. Domains absent
    from ``weights`` are dropped (weight 0). One window shuffle keyed
    by domain; the stride predicate is a projection. Keeps exactly
    ``floor(n * num/den)`` rows per domain, evenly spread across the
    seeded hash order. Products stay well under 2^53, so the floored
    double division is integer-exact on every engine."""
    h = _seeded_hex(F.col(key_col), seed)
    # two-phase per-domain rank: a domain can be arbitrarily large at
    # corpus scale, so the rank runs over (domain, hash-prefix bucket)
    # partitions — 256 parallel windows per domain — with per-domain
    # prefix offsets broadcast back (plans/ranking.grouped_row_number),
    # never one window partition per domain. The first hash byte is a
    # leading prefix of the hash order, so the rank equals the plain
    # ORDER BY hash rank bit-for-bit.
    keyed = df.withColumn("_h", h).withColumn("_hb", F.substring("_h", 1, 2))
    ranked = grouped_row_number(
        keyed, [domain_col], ["_hb"], ["_h", key_col], rn_col=rank_col
    ).drop("_h", "_hb")
    num = _weight_col(weights, domain_col, 0, 0)
    den = _weight_col(weights, domain_col, 1, 1)
    r = F.col(rank_col)
    keep = F.floor(r * num / den) > F.floor((r - 1) * num / den)
    return ranked.filter(keep)


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance ``documents`` to the target language mixture; emits the
    surviving rows' identity plus their in-domain sample rank."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return domain_mix(docs, "lang", "doc_id", MIX_WEIGHTS, rank_col="rank_in_lang")


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle order for the corpus: seeded md5
    permutation key, two-phase global rank (first hash byte = 256
    prefix buckets), position is 1-based."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id", _seeded_hex(F.col("doc_id"), SHUFFLE_SEED).alias("h")
    ).withColumn("b", F.substring("h", 1, 2))
    return global_row_number(
        keyed, ["b"], ["h", "doc_id"], rn_col="shuffle_pos"
    ).select("doc_id", F.col("shuffle_pos").cast("long").alias("shuffle_pos"))


_MIX_CASE_NUM = "CASE lang " + " ".join(
    f"WHEN '{d}' THEN {n}" for d, (n, _) in MIX_WEIGHTS.items()
) + " ELSE 0 END"
_MIX_CASE_DEN = "CASE lang " + " ".join(
    f"WHEN '{d}' THEN {den}" for d, (_, den) in MIX_WEIGHTS.items()
) + " ELSE 1 END"

SAMPLING_QUERIES = {}

# q_corpus_shuffle: evicted in the round-5 rotation (slot funds
# q_corpus_funnel, whose shuffle_pos stage hash-checks this same
# seeded-md5 two-phase global rank over the funnel's survivor set).
# q_domain_mix: evicted in the round-8 rotation (slot funds
# q_hist_quantiles) — the integer boundary-crossing keep rule stays
# hash-checked inside the registered q_temperature_mix (same
# ``(r*num) div den > ((r-1)*num) div den`` predicate over the same
# seeded per-domain rank, with temperature-derived weights) and inside
# the registered q_corpus_funnel's mix stage. Both keep driver-grade
# DuckDB comparisons in tests/test_unregistered_ops.py.
UNREGISTERED_SAMPLING_QUERIES = {
    "q_corpus_shuffle": q_corpus_shuffle,
    "q_domain_mix": q_domain_mix,
}

SAMPLING_ORACLES = {}

_DOMAIN_MIX_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS r,
         {_MIX_CASE_NUM} AS num, {_MIX_CASE_DEN} AS den
  FROM documents
)
SELECT doc_id, lang, source, r AS rank_in_lang
FROM ranked
WHERE (r * num) // den > ((r - 1) * num) // den
"""

UNREGISTERED_SAMPLING_ORACLES = {
    "q_corpus_shuffle": f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS shuffle_pos
FROM documents
""",
    "q_domain_mix": _DOMAIN_MIX_ORACLE,
}


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: documents ranked easy->hard by
    quality quartile (the text-analysis quality score; bucket 0 = top
    quartile) with a SEEDED SHUFFLE inside each bucket — the standard
    quality-curriculum schedule (high-quality data first, order within
    a difficulty tier randomized). (doc_id, quality, bucket,
    curriculum_pos).

    Scale shape: quartile thresholds are ONE 1-row broadcast aggregate
    (never a global sort); the position is the two-phase
    ``global_row_number`` over (bucket, hash-prefix) buckets — 4x256
    parallel windows + broadcast prefix offsets, the q_corpus_shuffle
    idiom extended with a leading curriculum key. (Unregistered —
    50-slot cap; driver-grade DuckDB parity in
    tests/test_unregistered_ops.py.)"""
    from .text_analysis import q_quality_score

    scored = q_quality_score(spark, sf_dir).select("doc_id", "quality")
    thresholds = scored.agg(
        F.expr("percentile(quality, 0.25)").alias("p25"),
        F.expr("percentile(quality, 0.50)").alias("p50"),
        F.expr("percentile(quality, 0.75)").alias("p75"),
    )
    bucket = (
        F.when(F.col("quality") >= F.col("p75"), 0)
        .when(F.col("quality") >= F.col("p50"), 1)
        .when(F.col("quality") >= F.col("p25"), 2)
        .otherwise(3)
    )
    keyed = (
        scored.crossJoin(F.broadcast(thresholds))
        .select("doc_id", "quality", bucket.alias("bucket"))
        .withColumn("h", _seeded_hex(F.col("doc_id"), SHUFFLE_SEED))
        .withColumn("hb", F.substring("h", 1, 2))
    )
    return global_row_number(
        keyed, ["bucket", "hb"], ["h", "doc_id"], rn_col="curriculum_pos"
    ).select(
        "doc_id",
        "quality",
        "bucket",
        F.col("curriculum_pos").cast("long").alias("curriculum_pos"),
    )


from ..functions.text import STOPWORDS as _STOPWORDS, sql_tokens as _sql_tokens

_STOPS_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS["en"])

CURRICULUM_ORDER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens('text')} AS tokens FROM documents
),
scored AS (
  SELECT doc_id,
         round(least(1.0, len(tokens) / 100.0)
               * (1 - list_sum(list_transform(tokens,
                     t -> CASE WHEN t IN ({_STOPS_SQL}) THEN 1 ELSE 0 END))
                  / CAST(len(tokens) AS DOUBLE)), 6) AS quality
  FROM toks WHERE len(tokens) > 0
),
th AS (
  SELECT quantile_cont(quality, 0.25) AS p25,
         quantile_cont(quality, 0.50) AS p50,
         quantile_cont(quality, 0.75) AS p75
  FROM scored
),
bucketed AS (
  SELECT doc_id, quality,
         CASE WHEN quality >= p75 THEN 0
              WHEN quality >= p50 THEN 1
              WHEN quality >= p25 THEN 2
              ELSE 3 END AS bucket,
         md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
  FROM scored, th
)
SELECT doc_id, quality, bucket,
       row_number() OVER (ORDER BY bucket, h, doc_id) AS curriculum_pos
FROM bucketed
"""


# ---------------------------------------------------------------------------
# Temperature-based domain resampling (the multilingual-corpus sampling
# rule: sample domain d with probability ∝ p_d^alpha, alpha < 1 — mBERT
# / XLM-R / T5 all train on exactly this). alpha = 1/2 here, for an
# engine-portability reason worth recording: IEEE-754 ``sqrt`` is
# CORRECTLY ROUNDED on every engine, ``pow(x, 0.3)`` is not — so the
# sqrt form yields bit-identical per-domain targets in Spark and DuckDB
# while arbitrary alpha could flip a floor at a boundary. Unlike
# ``domain_mix`` (pure downsampling), temperature sampling UPSAMPLES
# small domains: the output carries an integer ``n_copies`` per doc
# (epoch multiplicity — base copies spread evenly via the same
# rank-stride rule), so one materialized relation expresses both down-
# and up-sampling with replacement.
#
# Scale: one tiny per-domain stats relation (broadcast back), the
# cross-domain sqrt sum folded in domain-name order (pinned summation
# order), per-doc ranks via the 256-bucket two-phase grouped rank —
# no single-partition window anywhere.
# ---------------------------------------------------------------------------


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    seed: int | str = SHUFFLE_SEED,
) -> DataFrame:
    """(row..., rank_in_domain, n_copies): sqrt-temperature resampling
    with total budget = corpus size. Domain d's target count is
    ``k_d = floor(N * sqrt(n_d) / sum_e sqrt(n_e))``; each doc gets
    ``k_d div n_d`` base copies plus one extra on the evenly-spread
    rank stride of the remainder — ``sum(n_copies)`` per domain is
    exactly ``k_d``."""
    stats = df.groupBy(domain_col).agg(F.count("*").alias("_nd"))
    tot = stats.agg(
        F.sum("_nd").alias("_N"),
        # domain-name-sorted fold: pinned summation order on both engines
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(domain_col).alias("d"),
                            F.sqrt("_nd").alias("v"),
                        )
                    )
                ),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_S"),
    )
    targets = stats.crossJoin(F.broadcast(tot)).select(
        domain_col,
        "_nd",
        F.floor(F.col("_N") * F.sqrt("_nd") / F.col("_S")).alias("_kd"),
    )
    h = _seeded_hex(F.col(key_col), seed)
    keyed = df.withColumn("_h", h).withColumn("_hb", F.substring("_h", 1, 2))
    ranked = grouped_row_number(
        keyed, [domain_col], ["_hb"], ["_h", key_col], rn_col="rank_in_domain"
    ).drop("_h", "_hb")
    r = F.col("rank_in_domain")
    rem = F.col("_kd") % F.col("_nd")
    extra = (
        F.floor(r * rem / F.col("_nd")) > F.floor((r - 1) * rem / F.col("_nd"))
    ).cast("long")
    return (
        ranked.join(F.broadcast(targets), domain_col)
        .withColumn(
            "n_copies", (F.expr("_kd div _nd") + extra).cast("long")
        )
        .drop("_nd", "_kd")
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt-temperature language resampling of ``documents``: per-doc
    epoch multiplicities (small languages upsample above 1, the
    dominant language drops below 1 copy on average). (Unregistered —
    50-slot cap; driver-grade DuckDB parity + exact-target invariants
    in tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_mix(docs, "lang", "doc_id")


TEMPERATURE_MIX_ORACLE = f"""
WITH stats AS (
  SELECT lang, count(*) AS nd FROM documents GROUP BY lang
),
tot AS (
  SELECT sum(nd) AS N,
         list_sum(list(sqrt(nd) ORDER BY lang)) AS S
  FROM stats
),
targets AS (
  SELECT lang, nd, CAST(floor(N * sqrt(nd) / S) AS BIGINT) AS kd
  FROM stats, tot
),
ranked AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rank_in_domain
  FROM documents
)
SELECT r.doc_id, r.lang, r.rank_in_domain,
       CAST(kd // nd
            + (CASE WHEN (r.rank_in_domain * (kd % nd)) // nd
                     > ((r.rank_in_domain - 1) * (kd % nd)) // nd
               THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
FROM ranked r JOIN targets USING (lang)
"""


# ---------------------------------------------------------------------------
# Stratified k-fold assignment — the cross-validation / eval-protocol
# split. Hash-mod folds balance only in expectation; the rank-stride
# form ((rank - 1) % k over the seeded permutation order, per stratum)
# gives EXACT balance — fold sizes within each stratum differ by at
# most one, deterministically — while staying key-stable enough for
# reproducibility (the fold of a doc depends only on the corpus
# content, the seed, and k). Same two-phase grouped rank as
# domain_mix, so a corpus-sized stratum never funnels through one
# window partition.
# ---------------------------------------------------------------------------

KFOLD_K = 5


def stratified_kfold(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int = KFOLD_K,
    seed: int | str = SHUFFLE_SEED,
) -> DataFrame:
    """(row..., rank_in_stratum, fold): fold ∈ [0, k) assigned by rank
    stride within each stratum's seeded hash order."""
    h = _seeded_hex(F.col(key_col), seed)
    keyed = df.withColumn("_h", h).withColumn("_hb", F.substring("_h", 1, 2))
    ranked = grouped_row_number(
        keyed, [stratum_col], ["_hb"], ["_h", key_col], rn_col="rank_in_stratum"
    ).drop("_h", "_hb")
    return ranked.withColumn(
        "fold", ((F.col("rank_in_stratum") - 1) % k).cast("int")
    )


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold stratified-by-language split of ``documents``.
    (Unregistered — 50-slot cap; driver-grade DuckDB parity +
    exact-balance/coverage invariants in
    tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_kfold(docs, "lang", "doc_id")


STRATIFIED_KFOLD_ORACLE = f"""
SELECT doc_id, lang, rank_in_stratum,
       CAST((rank_in_stratum - 1) % {KFOLD_K} AS INTEGER) AS fold
FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rank_in_stratum
  FROM documents
)
"""

# Registered in the round-5 rotation (slot funded by q_stream_sliding):
# sqrt-temperature resampling with bit-identical targets.
SAMPLING_QUERIES["q_temperature_mix"] = q_temperature_mix
SAMPLING_ORACLES["q_temperature_mix"] = TEMPERATURE_MIX_ORACLE


# ---------------------------------------------------------------------------
# Token-budget selection — "give me the best corpus that fits N tokens":
# rank documents by quality (ties by key) and keep the prefix whose
# cumulative token count fits the budget. The greedy quality-first
# prefix is the standard data-constrained-training selection rule.
#
# Scale shape: the obvious plan (one global ORDER BY quality DESC with
# a running sum) serializes the corpus through a single window
# partition. Instead both the rank AND the running token sum are
# two-phase: quality buckets (a leading prefix of the sort order) give
# parallel within-bucket windows, and the tiny per-bucket token totals
# prefix-sum in O(#buckets) before broadcasting back — the
# global_row_number idiom, extended to a distributed cumulative sum.
# ---------------------------------------------------------------------------

BUDGET_BUCKETS = 16


def budget_select(
    df: DataFrame,
    key_col: str,
    score_col: str,
    tokens_col: str,
    budget: Column,
) -> DataFrame:
    """(key, score, tokens, sel_rank, cum_tokens, selected) — greedy
    score-descending prefix under a cumulative token ``budget`` (a
    Column so callers can derive it from the corpus itself). ``score``
    must lie in [0, 1] (the bucketing contract; quality scores here
    always are)."""
    neg = (-F.col(score_col)).alias("_neg")
    keyed = df.select(
        key_col, score_col, tokens_col, neg,
        F.floor(-F.col(score_col) * BUDGET_BUCKETS).cast("int").alias("_bk"),
        budget.cast("long").alias("_budget"),
    )
    local_w = W.partitionBy("_bk").orderBy("_neg", key_col)
    run = local_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = keyed.withColumn(
        "_lrn", F.row_number().over(local_w).cast("long")
    ).withColumn("_lcum", F.sum(tokens_col).over(run).cast("long"))
    offs = (
        keyed.groupBy("_bk")
        .agg(
            F.count("*").alias("_cnt"),
            F.sum(tokens_col).cast("long").alias("_tok"),
        )
        .withColumn(
            "_rn_off",
            F.coalesce(
                F.sum("_cnt").over(
                    W.orderBy("_bk").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "_tok_off",
            F.coalesce(
                F.sum("_tok").over(
                    W.orderBy("_bk").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_bk", "_rn_off", "_tok_off")
    )
    cum = (F.col("_tok_off") + F.col("_lcum")).alias("cum_tokens")
    return (
        local.join(F.broadcast(offs), "_bk")
        .select(
            key_col, score_col, tokens_col,
            (F.col("_rn_off") + F.col("_lrn")).alias("sel_rank"),
            cum,
            (F.col("_tok_off") + F.col("_lcum") <= F.col("_budget")).alias(
                "selected"
            ),
        )
    )


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-first token-budget selection over ``documents``: budget
    is one third of the corpus's total tokens (corpus-derived, so the
    cutoff bites at every SF), scores are the text-analysis quality
    relation. (Unregistered — 50-slot cap; driver-grade DuckDB parity
    in tests/test_unregistered_ops.py.)"""
    from .text_analysis import q_quality_score

    scored = q_quality_score(spark, sf_dir).select(
        "doc_id", "quality", "n_tokens"
    )
    budget_rel = scored.agg(
        (F.sum("n_tokens") / 3).cast("long").alias("_budget")
    )
    keyed = scored.crossJoin(F.broadcast(budget_rel))
    return budget_select(
        keyed, "doc_id", "quality", "n_tokens", F.col("_budget")
    )


BUDGET_SELECT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens('text')} AS tokens FROM documents
),
scored AS (
  SELECT doc_id,
         round(least(1.0, len(tokens) / 100.0)
               * (1 - list_sum(list_transform(tokens,
                     t -> CASE WHEN t IN ({_STOPS_SQL}) THEN 1 ELSE 0 END))
                  / CAST(len(tokens) AS DOUBLE)), 6) AS quality,
         CAST(len(tokens) AS BIGINT) AS n_tokens
  FROM toks WHERE len(tokens) > 0
),
budget AS (SELECT CAST(sum(n_tokens) // 3 AS BIGINT) AS b FROM scored),
laid AS (
  SELECT doc_id, quality, n_tokens,
         CAST(row_number() OVER w AS BIGINT) AS sel_rank,
         CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens
  FROM scored
  WINDOW w AS (ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, quality, n_tokens, sel_rank, cum_tokens,
       cum_tokens <= b AS selected
FROM laid, budget
"""


# ---------------------------------------------------------------------------
# Probability-proportional-to-size Poisson sampling — the weighted
# subsample ("sample documents proportionally to token count / quality
# mass") with EXACT integer selection arithmetic: doc selected iff
# u * W < 2^32 * k * w, where u is the doc's 32-bit md5 integer, w its
# weight, W the corpus weight total, k the expected sample size. No
# transcendental functions anywhere, so Spark and any oracle agree
# bit-for-bit (an Efraimidis-Spirakis exp/pow key would be at the
# mercy of libm last-ulp differences across engines). Inclusion
# probability is min(1, k*w/W) exactly.
#
# Scale: one corpus scan + one 1-row broadcast total; the predicate is
# per-row integer math in DECIMAL(38,0) so the product u*W cannot
# overflow even at 100 TB weight totals (u < 2^32, W < 10^28 fits).
# ---------------------------------------------------------------------------

PPS_K = 25


def pps_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = PPS_K,
    seed: int | str = SHUFFLE_SEED,
) -> DataFrame:
    """(key, weight, u32, selected): Poisson PPS sample with expected
    size ``k`` (exact when no weight hits the min(1, .) cap)."""
    u32 = (
        F.conv(
            F.substring(_seeded_hex(F.col(key_col), seed), 1, 8), 16, 10
        ).cast("long")
    )
    tot = df.agg(
        F.sum(F.col(weight_col)).cast("decimal(19,0)").alias("_W")
    )
    dec = "decimal(19,0)"
    lhs = F.col("u32").cast(dec) * F.col("_W")
    rhs = (
        F.lit(2**32).cast(dec)
        * F.lit(k).cast(dec)
        * F.col(weight_col).cast(dec)
    )
    return (
        df.select(key_col, weight_col, u32.alias("u32"))
        .crossJoin(F.broadcast(tot))
        .select(
            key_col, weight_col, "u32", (lhs < rhs).alias("selected")
        )
    )


def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count-weighted Poisson PPS sample of ``documents``
    (expected ``PPS_K`` = 25 docs; long documents proportionally likelier —
    the token-mass-preserving subsample). (Unregistered — 50-slot cap;
    driver-grade DuckDB parity + integer-exactness invariants in
    tests/test_unregistered_ops.py.)"""
    from .text_analysis import q_quality_score

    scored = q_quality_score(spark, sf_dir).select("doc_id", "n_tokens")
    return pps_sample(scored, "doc_id", "n_tokens")


PPS_SAMPLE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens('text')} AS tokens FROM documents
),
scored AS (
  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens
  FROM toks WHERE len(tokens) > 0
),
tot AS (SELECT CAST(sum(n_tokens) AS HUGEINT) AS W FROM scored)
SELECT doc_id, n_tokens,
       CAST(('0x' || substr(md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)),
                            1, 8))::BIGINT AS BIGINT) AS u32,
       CAST(('0x' || substr(md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)),
                            1, 8))::BIGINT AS HUGEINT) * W
         < CAST(4294967296 AS HUGEINT) * {PPS_K} * n_tokens AS selected
FROM scored, tot
"""

UNREGISTERED_SAMPLING_QUERIES["q_budget_select"] = q_budget_select
UNREGISTERED_SAMPLING_ORACLES["q_budget_select"] = BUDGET_SELECT_ORACLE
UNREGISTERED_SAMPLING_QUERIES["q_pps_sample"] = q_pps_sample
UNREGISTERED_SAMPLING_ORACLES["q_pps_sample"] = PPS_SAMPLE_ORACLE


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
# Data Mixtures Speeds Up Language Model Pretraining", arXiv:2305.10429
# / NeurIPS 2023) — the LEARNED answer to "what mixture?" that
# domain_mix/temperature_mix take as an input. The paper's Group-DRO
# loop upweights domains by EXCESS LOSS: proxy-model loss minus a
# per-domain reference-model loss, clipped at zero, fed through
# multiplicative weights (exp(step * excess)) and smoothed with the
# uniform mixture.
#
# Relational form (one-step, documented honestly): the "proxy" is the
# GENERALIST add-one unigram LM trained on the whole corpus; the
# per-domain "reference" is the SPECIALIST unigram LM trained on that
# domain alone (both exactly the q_lm_score training aggregate). The
# per-domain excess cross-entropy
#     excess_d = max(0, CE_d(generalist) - CE_d(specialist))
# is the empirical estimate of how much better a domain-tuned model
# does than the corpus-wide model on domain d — the high-excess
# domains are the ones the paper's loop upweights (hard-but-learnable
# relative to the current mixture); near-zero excess means the corpus
# model already covers the domain.
#
# Plan shape at 100 TB: ONE corpus explode-shuffle keyed
# (domain, token) builds the specialist count relation; the generalist
# counts, per-domain totals, and the discount/normalization rows all
# derive from that vocabulary-bounded relation (map-side-combinable
# aggregates — never a second corpus pass for counts); a light
# column-pruned scan counts docs per domain. Scoring joins the
# specialist relation to broadcast generalist counts + tiny totals.
# Determinism: every cross-entropy contribution casts to
# decimal(25,12) before summing (order-independent exactly), CE
# rounds to 6 dp BEFORE the excess/exp so both engines exponentiate
# identical doubles, each exp rounds to 12 dp before the k-row
# normalization sum.
# ---------------------------------------------------------------------------

DOREMI_STEP = 1.0     # multiplicative-weights step (eta in the paper)
DOREMI_SMOOTH = 0.001  # uniform-smoothing mass (c in the paper, their default)


def doremi_weights(docs: DataFrame, domain_col: str = "source") -> DataFrame:
    """(domain, n_docs, n_tokens, ce_generalist, ce_specialist, excess,
    weight): one-step DoReMi domain weights over ``docs(domain, text)``.
    Domains whose documents contain zero tokens carry no CE estimate
    and drop (excess undefined)."""
    from ..functions.text import tokenize

    ex = docs.select(
        F.col(domain_col).alias("domain"),
        F.explode(tokenize(F.col("text"))).alias("token"),
    )
    # the ONE corpus shuffle; LAZY CHECKPOINT barrier (the dsir idiom —
    # a bare repartition would NOT be reused: each of dt's three
    # consumers — the generalist derivation, the per-domain totals, the
    # scoring join — prunes different columns below the exchange, so
    # the subtrees never canonicalize equal). Materializing the
    # vocabulary-bounded relation once keeps this a single corpus pass.
    dt = (
        ex.groupBy("domain", "token")
        .agg(F.count("*").alias("c_dt"))
        .repartition(F.col("token"))
        .localCheckpoint(eager=False)
    )
    gfreq = dt.groupBy("token").agg(F.sum("c_dt").alias("cnt"))
    gtot = gfreq.agg(F.sum("cnt").alias("T"), F.count("*").alias("V"))
    dtot = dt.groupBy("domain").agg(
        F.sum("c_dt").alias("T_d"), F.count("*").alias("V_d")
    )
    ndocs = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )

    contrib = (
        dt.join(F.broadcast(gfreq), "token")
        .join(F.broadcast(dtot), "domain")
        .crossJoin(F.broadcast(gtot))
        .select(
            "domain",
            (
                F.col("c_dt")
                * -F.log(
                    (F.col("cnt") + F.lit(1)) / (F.col("T") + F.col("V"))
                )
            ).cast("decimal(25,12)").alias("cg"),
            (
                F.col("c_dt")
                * -F.log(
                    (F.col("c_dt") + F.lit(1))
                    / (F.col("T_d") + F.col("V_d"))
                )
            ).cast("decimal(25,12)").alias("cs"),
        )
    )
    ce = (
        contrib.groupBy("domain")
        .agg(
            F.sum("cg").cast("double").alias("sg"),
            F.sum("cs").cast("double").alias("ss"),
        )
        .join(F.broadcast(dtot), "domain")
        .select(
            "domain",
            F.col("T_d").cast("long").alias("n_tokens"),
            F.round(F.col("sg") / F.col("T_d"), 6).alias("ce_generalist"),
            F.round(F.col("ss") / F.col("T_d"), 6).alias("ce_specialist"),
        )
    )
    exd = ce.select(
        "*",
        F.greatest(
            F.col("ce_generalist") - F.col("ce_specialist"), F.lit(0.0)
        ).alias("excess"),
    ).select(
        "*",
        F.round(F.exp(F.lit(DOREMI_STEP) * F.col("excess")), 12)
        .cast("decimal(25,12)")
        .alias("ew"),
    )
    norm = exd.agg(
        F.sum("ew").alias("Z"), F.count("*").alias("k")
    )
    return (
        exd.crossJoin(F.broadcast(norm))
        .join(F.broadcast(ndocs), "domain")
        .select(
            "domain",
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_tokens",
            "ce_generalist",
            "ce_specialist",
            F.round(F.col("excess"), 6).alias("excess"),
            # double/double division (NOT decimal/decimal — the two
            # engines disagree on quotient scale); ew and Z are exact
            # decimals so the double casts are deterministic
            F.round(
                F.lit(1.0 - DOREMI_SMOOTH)
                * (F.col("ew").cast("double") / F.col("Z").cast("double"))
                + F.lit(DOREMI_SMOOTH) / F.col("k"),
                6,
            ).alias("weight"),
        )
    )


def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step DoReMi domain weights over ``documents`` grouped by
    ``source``. (REGISTERED in the round-8 second rotation, funded by
    q_tpch_q14; DuckDB parity + independent-replay golden + mixture
    invariants in tests/test_unregistered_ops.py.)"""
    from ..sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return doremi_weights(docs, "source")


def _doremi_oracle() -> str:
    from ..functions.text import sql_tokens

    toks = sql_tokens("text")
    return f"""
WITH ex AS (
  SELECT source AS domain, unnest({toks}) AS token FROM documents
),
dt AS (SELECT domain, token, count(*) AS c_dt FROM ex GROUP BY 1, 2),
gfreq AS (SELECT token, sum(c_dt) AS cnt FROM dt GROUP BY token),
gtot AS (SELECT sum(cnt) AS T, count(*) AS V FROM gfreq),
dtot AS (SELECT domain, sum(c_dt) AS T_d, count(*) AS V_d
         FROM dt GROUP BY domain),
ndocs AS (SELECT source AS domain, count(*) AS n_docs
          FROM documents GROUP BY 1),
contrib AS (
  SELECT d.domain,
         CAST(d.c_dt * -ln((g.cnt + 1) / CAST(t.T + t.V AS DOUBLE))
              AS DECIMAL(25,12)) AS cg,
         CAST(d.c_dt * -ln((d.c_dt + 1) / CAST(s.T_d + s.V_d AS DOUBLE))
              AS DECIMAL(25,12)) AS cs
  FROM dt d
  JOIN gfreq g USING (token)
  JOIN dtot s USING (domain)
  CROSS JOIN gtot t
),
ce AS (
  SELECT c.domain,
         CAST(s.T_d AS BIGINT) AS n_tokens,
         round(CAST(sum(c.cg) AS DOUBLE) / s.T_d, 6) AS ce_generalist,
         round(CAST(sum(c.cs) AS DOUBLE) / s.T_d, 6) AS ce_specialist
  FROM contrib c JOIN dtot s USING (domain)
  GROUP BY c.domain, s.T_d
),
exd AS (
  SELECT *,
         greatest(ce_generalist - ce_specialist, 0.0) AS excess,
         CAST(round(exp({DOREMI_STEP} * greatest(
              ce_generalist - ce_specialist, 0.0)), 12)
              AS DECIMAL(25,12)) AS ew
  FROM ce
),
norm AS (SELECT sum(ew) AS Z, count(*) AS k FROM exd)
SELECT e.domain,
       CAST(n.n_docs AS BIGINT) AS n_docs,
       e.n_tokens,
       e.ce_generalist,
       e.ce_specialist,
       round(e.excess, 6) AS excess,
       round(CAST({1.0 - DOREMI_SMOOTH} AS DOUBLE)
               * (CAST(e.ew AS DOUBLE) / CAST(norm.Z AS DOUBLE))
             + CAST({DOREMI_SMOOTH} AS DOUBLE) / norm.k, 6) AS weight
FROM exd e CROSS JOIN norm JOIN ndocs n ON e.domain = n.domain
"""


DOREMI_WEIGHTS_ORACLE = _doremi_oracle()

# REGISTERED in the round-8 second rotation (slot funded by
# q_tpch_q14; see registry.py / tests for the eviction's parity test)
SAMPLING_QUERIES["q_doremi_weights"] = q_doremi_weights
SAMPLING_ORACLES["q_doremi_weights"] = DOREMI_WEIGHTS_ORACLE
