"""End-to-end training-corpus build — the composition the individual
operators exist for, as one callable pipeline:

    raw documents
      -> exact dedup          (q_dedup_exact: min-doc per sha256)
      -> near dedup           (q_dedup_prefix: exact AllPairs Jaccard,
                               first-occurrence-wins — doc_b drops)
      -> quality filter       (quality_profile keep verdict, Gopher
                               battery; token-less docs drop)
      -> decontamination      (contamination_report: drop any training
                               doc colliding with the eval suite; the
                               eval docs themselves never enter)
      -> temperature resample (temperature_mix: sqrt-temperature
                               per-language epoch multiplicities)
      -> deterministic order  (seeded md5 rank via the two-phase
                               global_row_number — no single-partition
                               sort)
      -> sequence packing     (pack_assignments: hash-sharded token
                               streams cut into fixed budgets)
      -> shard write          (write_training_shards: bounded
                               records-per-file parquet for loaders)

Every stage is an operator with its own oracle/direct test; this
module adds the JOIN PLUMBING between verdict relations (semi/anti
joins on doc_id — never a collect) and a reconciliation report so a
production run can assert the funnel arithmetic. Dedup and
decontamination verdicts are computed CORPUS-WIDE (on the raw table,
where their oracles run) and applied as verdict joins — the verdict
relations are tiny next to the corpus and the stages stay
independently checkable.

Scale: the pipeline inherits each stage's plan (all bucketed /
broadcast / two-phase shapes — see the per-operator scale notes); the
composition itself adds only doc_id-keyed semi/anti joins, which AQE
broadcasts while the verdict sets are small and shuffles on the key
otherwise. The reconciliation counts are driver scalars, one aggregate
per funnel stage — a reporting cost, not a data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ranking import global_row_number
from ..sources.loader import load_table
from ..sources.sinks import write_training_shards
from .contamination import (
    CONTAMINATION_ORACLES,
    EVAL_MOD,
    EVAL_REM,
    q_decontaminate,
)
from .dedup import PREFIX_DEDUP_ORACLE, q_dedup_exact, q_dedup_prefix
from .packing import NSHARDS, PACK_BUDGET, pack_assignments
from .quality import QUALITY_ORACLES, quality_profile
from .sampling import SHUFFLE_SEED, _seeded_hex, temperature_mix


def layout_stage(s: DataFrame) -> DataFrame:
    """The funnel's LAYOUT TAIL — temperature resample, seeded global
    shuffle, shuffle-ordered sequence packing — over a survivor
    relation carrying (doc_id, text, lang, source, n_tokens). Shared
    verbatim by the heuristic funnel below and the model-augmented
    curated funnel (``operators/curated_corpus.py``), so a curated
    build packs shards with the exact layout the registered
    ``q_corpus_funnel`` hash-checks."""
    mixed = temperature_mix(s, "lang", "doc_id").filter(F.col("n_copies") >= 1)

    keyed = mixed.withColumn(
        "_h", _seeded_hex(F.col("doc_id"), SHUFFLE_SEED)
    ).withColumn("_hb", F.substring("_h", 1, 2))
    ordered = global_row_number(
        keyed, ["_hb"], ["_h", "doc_id"], rn_col="shuffle_pos"
    ).drop("_h", "_hb")

    # the shuffle rank DRIVES pack layout (ADVICE r04): without
    # order_col the packer's internal window would re-order each shard
    # by doc_id, silently undoing the seeded shuffle for adjacency.
    # carry_cols threads the row payload through the pack windows in
    # ONE pass — the earlier layout-then-self-join shape recomputed the
    # whole upstream funnel twice (measured 2x at sf0.1).
    return pack_assignments(
        ordered, "doc_id", "n_tokens", order_col="shuffle_pos",
        carry_cols=True,
    ).select(
        "doc_id", "text", "lang", "source", "n_tokens", "n_copies",
        "shuffle_pos", "shard", "seq_in_shard", "start_off", "pack_seq",
        "crosses_boundary",
    )


def funnel_stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The funnel as NAMED STAGE RELATIONS — the single source both the
    shard-writing build and the registered ``q_corpus_funnel`` query
    compose from (so the hash-checked relation cannot drift from what
    production writes). Keys: ``train``, ``after_exact``, ``after_near``,
    ``after_quality``, ``after_decontam``, ``final`` (the packed layout
    incl. ``text``)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # eval docs are held out up front: they are the benchmark suite,
    # never training corpus
    stages: dict[str, DataFrame] = {}
    train = docs.filter(~(F.col("doc_id") % EVAL_MOD == EVAL_REM))
    stages["train"] = train

    keep_exact = q_dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    s = train.join(keep_exact, "doc_id", "left_semi")
    stages["after_exact"] = s

    drop_near = (
        q_dedup_prefix(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s = s.join(drop_near, "doc_id", "left_anti")
    stages["after_near"] = s

    quality = quality_profile(docs).filter("keep").select("doc_id", "n_tokens")
    s = s.join(quality, "doc_id")  # inner: carries n_tokens forward
    stages["after_quality"] = s

    contaminated = (
        q_decontaminate(spark, sf_dir)
        .filter("contaminated")
        .select("doc_id")
    )
    s = s.join(contaminated, "doc_id", "left_anti")
    stages["after_decontam"] = s

    # STAGE BOUNDARY: the two-phase rank helpers each reference their
    # input twice (local rank + bucket offsets), so the mix -> shuffle
    # -> pack chain would re-instantiate the whole verdict pipeline
    # 2x2x2 = 8 times (measured: 112 documents-scan leaves in the
    # funnel plan vs 14 across the stages). One lazy localCheckpoint
    # materializes the survivor set on first action; everything
    # downstream re-reads the materialized blocks — exactly the
    # checkpoint a 100 TB production funnel would place here.
    s = s.localCheckpoint(eager=False)

    stages["final"] = layout_stage(s)
    return stages


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    records_per_file: int = 200,
    with_report: bool = True,
) -> dict:
    """Run the full funnel over ``documents`` and write training
    shards to ``out_path``. Returns the reconciliation report:
    ``{input, after_exact, after_near, after_quality, after_decontam,
    rows_written, total_copies, n_shard_files}`` — each stage count
    the survivors AFTER that verdict joins in, so the funnel is
    monotone non-increasing by construction (pinned by test).

    ``with_report=False`` skips the per-stage counts: each count is a
    separate action that re-executes the funnel prefix, an acceptable
    diagnostic cost at audit time but 5 extra corpus passes a 100 TB
    production run should not pay — the write-only path executes the
    plan exactly once."""
    stages = funnel_stages(spark, sf_dir)

    def _n(df):
        return df.count() if with_report else None

    report: dict = {
        "input": _n(stages["train"]),
        "after_exact": _n(stages["after_exact"]),
        "after_near": _n(stages["after_near"]),
        "after_quality": _n(stages["after_quality"]),
        "after_decontam": _n(stages["after_decontam"]),
    }
    write_training_shards(stages["final"], out_path, records_per_file)
    out = spark.read.parquet(out_path)
    report["rows_written"] = out.count()
    report["total_copies"] = out.agg(F.sum("n_copies")).collect()[0][0]
    import glob
    import os

    report["n_shard_files"] = len(
        glob.glob(os.path.join(out_path, "*.parquet"))
    )
    return report


def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed funnel output as a deterministic relation (VERDICT
    r04 #9: the capstone gets its own CORRECTNESS row, not just
    per-stage checks): exactly what ``build_training_corpus`` writes to
    shards, minus the ``text`` payload — doc identity, language/source,
    token count, epoch multiplicity, global shuffle position, and the
    full pack layout. One row per surviving training document; every
    verdict join, the survivor-set temperature mix, the seeded global
    shuffle, and the shuffle-ordered packing are all inside the hash."""
    return funnel_stages(spark, sf_dir)["final"].drop("text")


# The DuckDB twin composes the REGISTERED stage oracles verbatim
# (exact-dedup keep set, prefix-join near-dup drops, quality keeps,
# contamination drops) and then replays the temperature mix over the
# SURVIVOR set, the seeded md5 global order, and the shuffle-ordered
# concat-and-chunk layout — the composition itself is what this oracle
# adds over the per-stage rows.
CORPUS_FUNNEL_ORACLE = f"""
WITH keep_exact AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
),
drop_near AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({PREFIX_DEDUP_ORACLE})
),
qual AS (
  SELECT doc_id, n_tokens
  FROM ({QUALITY_ORACLES['q_quality_filter']}) WHERE keep
),
contam AS (
  SELECT doc_id FROM ({CONTAMINATION_ORACLES['q_decontaminate']})
  WHERE contaminated
),
surv AS (
  SELECT d.doc_id, d.lang, d.source, q.n_tokens
  FROM documents d JOIN qual q USING (doc_id)
  WHERE d.doc_id % {EVAL_MOD} <> {EVAL_REM}
    AND d.doc_id IN (SELECT doc_id FROM keep_exact)
    AND d.doc_id NOT IN (SELECT doc_id FROM drop_near)
    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
),
stats AS (SELECT lang, count(*) AS nd FROM surv GROUP BY lang),
tot AS (
  SELECT sum(nd) AS N, list_sum(list(sqrt(nd) ORDER BY lang)) AS S
  FROM stats
),
targets AS (
  SELECT lang, nd, CAST(floor(N * sqrt(nd) / S) AS BIGINT) AS kd
  FROM stats, tot
),
rankedm AS (
  SELECT s.*,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rank_in_domain
  FROM surv s
),
mixed AS (
  SELECT r.doc_id, r.lang, r.source, r.n_tokens,
         CAST(kd // nd
              + (CASE WHEN (r.rank_in_domain * (kd % nd)) // nd
                       > ((r.rank_in_domain - 1) * (kd % nd)) // nd
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
  FROM rankedm r JOIN targets USING (lang)
),
ordered AS (
  SELECT *,
         CAST(row_number() OVER (
           ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS shuffle_pos
  FROM mixed WHERE n_copies >= 1
),
laid AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {NSHARDS} AS BIGINT) AS shard,
         CAST(row_number() OVER w AS BIGINT) AS seq_in_shard,
         CAST(sum(n_tokens) OVER w AS BIGINT) AS cum,
         n_tokens
  FROM ordered
  WHERE n_tokens > 0
  WINDOW w AS (
    PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % {NSHARDS}
    ORDER BY shuffle_pos, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT o.doc_id, o.lang, o.source, o.n_tokens, o.n_copies, o.shuffle_pos,
       l.shard, l.seq_in_shard,
       cum - l.n_tokens AS start_off,
       (cum - l.n_tokens) // {PACK_BUDGET} AS pack_seq,
       ((cum - 1) // {PACK_BUDGET})
         <> ((cum - l.n_tokens) // {PACK_BUDGET}) AS crosses_boundary
FROM ordered o JOIN laid l USING (doc_id)
"""

# Registered in the round-5 rotation (slot funded by q_corpus_shuffle,
# whose seeded-md5 two-phase global rank is hash-checked inside this
# query's shuffle_pos stage; the evicted slot keeps its driver-grade
# parity test in tests/test_unregistered_ops.py).
CORPUS_QUERIES = {"q_corpus_funnel": q_corpus_funnel}
CORPUS_ORACLES = {"q_corpus_funnel": CORPUS_FUNNEL_ORACLE}


def heuristic_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, _exact_keep, _near_drop, _qual_keep, _contam):
    the heuristic funnel's four verdict relations left-joined onto the
    corpus as nullable evidence flags. ONE flag-joined relation serves
    both the attribution chain and the survivor set the temperature mix
    is fit on — the verdict subtrees appear once per use with identical
    shapes, so the physical planner's exchange reuse applies (an
    earlier form recomputed every verdict through funnel_stages'
    separate semi/anti joins). Shared by ``q_funnel_explain`` and the
    curated funnel's ``q_curated_explain``
    (``operators/curated_corpus.py``), which extends the chain with the
    three model-gate flags."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    keep_exact = q_dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id"), F.lit(True).alias("_exact_keep")
    )
    drop_near = (
        q_dedup_prefix(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_near_drop", F.lit(True))
    )
    qual = (
        quality_profile(load_table(spark, sf_dir, "documents"))
        .filter("keep")
        .select("doc_id", F.lit(True).alias("_qual_keep"))
    )
    contam = (
        q_decontaminate(spark, sf_dir)
        .filter("contaminated")
        .select("doc_id", F.lit(True).alias("_contam"))
    )
    return (
        docs.join(keep_exact, "doc_id", "left")
        .join(drop_near, "doc_id", "left")
        .join(qual, "doc_id", "left")
        .join(contam, "doc_id", "left")
    ).localCheckpoint(eager=False)  # same stage boundary as the funnel:
    # flagged feeds both the attribution chain and the survivor set the
    # mix is fit on; without materialization every verdict pipeline
    # would re-instantiate per reference


def q_funnel_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DROP ATTRIBUTION for the corpus funnel — the audit
    relation a production run needs when 'why did my corpus shrink 40%'
    comes up: one row per input document with the FIRST stage that
    removed it (``eval_holdout`` / ``exact_dup`` / ``near_dup`` /
    ``low_quality`` / ``contaminated`` / ``zero_copies``) or ``kept``.
    Stage order matches the funnel's join order, so
    ``count(*) GROUP BY stage`` reconciles exactly with
    ``build_training_corpus``'s report deltas.

    Scale: the verdict relations are the same tiny doc_id sets the
    funnel already computes; attribution is doc_id-keyed left-semi
    evidence folded with one ``when`` chain — no new corpus pass
    beyond the stage verdicts themselves. (Unregistered — 50-slot cap;
    driver-grade DuckDB parity in tests/test_unregistered_ops.py.)"""
    flagged = heuristic_flags(spark, sf_dir)
    surv = flagged.filter(
        ~(F.col("doc_id") % EVAL_MOD == EVAL_REM)
        & F.col("_exact_keep").isNotNull()
        & F.col("_near_drop").isNull()
        & F.col("_qual_keep").isNotNull()
        & F.col("_contam").isNull()
    ).select("doc_id", "lang")
    # the temperature mix is fit on the funnel's ACTUAL survivor set
    # (post-decontamination), exactly as build_training_corpus runs it
    mixed = temperature_mix(surv, "lang", "doc_id").select(
        "doc_id", "n_copies"
    )
    stage = (
        F.when(F.col("doc_id") % EVAL_MOD == EVAL_REM, "eval_holdout")
        .when(F.col("_exact_keep").isNull(), "exact_dup")
        .when(F.col("_near_drop").isNotNull(), "near_dup")
        .when(F.col("_qual_keep").isNull(), "low_quality")
        .when(F.col("_contam").isNotNull(), "contaminated")
        .when(F.col("n_copies") < 1, "zero_copies")
        .otherwise("kept")
    )
    return flagged.join(mixed, "doc_id", "left").select(
        "doc_id", "lang", stage.alias("stage"),
        (stage == "kept").alias("kept"),
    )


FUNNEL_EXPLAIN_ORACLE = f"""
WITH keep_exact AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
),
drop_near AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({PREFIX_DEDUP_ORACLE})
),
qual AS (
  SELECT doc_id FROM ({QUALITY_ORACLES['q_quality_filter']}) WHERE keep
),
contam AS (
  SELECT doc_id FROM ({CONTAMINATION_ORACLES['q_decontaminate']})
  WHERE contaminated
),
surv AS (
  SELECT d.doc_id, d.lang
  FROM documents d
  WHERE d.doc_id % {EVAL_MOD} <> {EVAL_REM}
    AND d.doc_id IN (SELECT doc_id FROM keep_exact)
    AND d.doc_id NOT IN (SELECT doc_id FROM drop_near)
    AND d.doc_id IN (SELECT doc_id FROM qual)
    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
),
stats AS (SELECT lang, count(*) AS nd FROM surv GROUP BY lang),
tot AS (
  SELECT sum(nd) AS N, list_sum(list(sqrt(nd) ORDER BY lang)) AS S
  FROM stats
),
targets AS (
  SELECT lang, nd, CAST(floor(N * sqrt(nd) / S) AS BIGINT) AS kd
  FROM stats, tot
),
rankedm AS (
  SELECT s.*,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rank_in_domain
  FROM surv s
),
mixed AS (
  SELECT r.doc_id,
         CAST(kd // nd
              + (CASE WHEN (r.rank_in_domain * (kd % nd)) // nd
                       > ((r.rank_in_domain - 1) * (kd % nd)) // nd
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
  FROM rankedm r JOIN targets USING (lang)
),
staged AS (
  SELECT d.doc_id, d.lang,
         CASE
           WHEN d.doc_id % {EVAL_MOD} = {EVAL_REM} THEN 'eval_holdout'
           WHEN d.doc_id NOT IN (SELECT doc_id FROM keep_exact)
             THEN 'exact_dup'
           WHEN d.doc_id IN (SELECT doc_id FROM drop_near) THEN 'near_dup'
           WHEN d.doc_id NOT IN (SELECT doc_id FROM qual)
             THEN 'low_quality'
           WHEN d.doc_id IN (SELECT doc_id FROM contam)
             THEN 'contaminated'
           WHEN coalesce(
             (SELECT m.n_copies FROM mixed m WHERE m.doc_id = d.doc_id), 0
           ) < 1 THEN 'zero_copies'
           ELSE 'kept'
         END AS stage
  FROM documents d
)
SELECT doc_id, lang, stage, stage = 'kept' AS kept FROM staged
"""

UNREGISTERED_CORPUS_QUERIES = {"q_funnel_explain": q_funnel_explain}
UNREGISTERED_CORPUS_ORACLES = {"q_funnel_explain": FUNNEL_EXPLAIN_ORACLE}
