"""Model-augmented corpus curation — the funnel the persisted
artifacts exist for, runnable entirely FROM FROZEN MODELS.

``build_training_corpus`` (operators/corpus_pipeline.py) is the
heuristic funnel: dedup, Gopher quality, decontamination, layout. This
module composes the TRAINED curation signals on top of it:

    heuristic survivor set  (funnel_stages: exact dedup -> AllPairs
                             near dedup -> quality -> decontamination)
      -> LM surprisal gate   (q_lm_score keep band — drops gibberish
                              and boilerplate the heuristics pass)
      -> classifier gate     (IRLS prose-vs-spam keep probability)
      -> semantic dedup      (SemDeDup verdicts over the embedding
                              space; docs without embeddings pass)
      -> layout tail         (temperature mix -> seeded shuffle ->
                              sequence packing — layout_stage, shared
                              verbatim with the registered funnel)

Every model stage exists in two forms that are PINNED BIT-IDENTICAL by
the per-operator tests (text_models / classifier / semdedup): an
inline form that fits inside the query, and a from-model form that
reads a persisted artifact under the shared commit protocol. This
module threads that split through the whole funnel: ``models=None``
fits everything inline (the audit/CI shape); ``models=<root>`` probes
the frozen artifacts (the 100 TB production shape — per-run cost drops
to scan + broadcast joins, no training pass anywhere). The funnel-level
equality test pins inline == from-models row-for-row.

``build_corpus_artifacts`` is the artifact BUILD side: every trained
model the engine persists, built once in dependency order — the
runbook order a production deployment follows (docs/RUNBOOK_100TB.md):

    1. text_models   (unigram/bigram LM, BM25 df/stats — one corpus
                      aggregation pass each, all map-side combinable)
    2. classifier    (IRLS weights; needs no other artifact)
    3. kmeans        (SemDeDup centroid model over embeddings)
    4. ann           (IVF + PQ index over embeddings; serves
                      similarity/kNN/cluster probes, not the funnel)
    5. dedup_index   (sha256 + banded-MinHash fingerprint index over
                      the corpus — the DAY-2 artifact future ingest
                      batches probe via `incremental_dedup`; built
                      last because it represents "history seen")

Scale: the curated gates are doc_id-keyed semi/anti joins exactly like
the heuristic verdicts — the verdict relations are corpus-row-count
sized at most (one row per doc), and each model probe is scan +
broadcast (model relations are Zipf-bounded vocabularies, k centroids,
or HASH_DIM+1 weights — all driver/broadcast sized). No stage adds a
corpus-by-corpus join beyond what its oracle-checked operator already
does. Reference parity: the reference (ItsRudraksh/
Data-Ingestion-API-System-Loop-AI, src/ingestService.js) has no
curation tier; this is the north-star extension mandated by
BASELINE.md (LLM training-data pipeline at design scale).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table
from ..sources.sinks import write_training_shards
from .classifier import (
    build_classifier_model,
    prose_labels,
    q_classifier_from_model,
    score_documents,
    train_classifier,
)
from .contamination import EVAL_MOD, EVAL_REM
from .corpus_pipeline import funnel_stages, heuristic_flags, layout_stage
from .lm_score import lm_scores
from .sampling import temperature_mix
from .semdedup import (
    SEMDEDUP_TAU,
    build_kmeans_model,
    q_semdedup_from_model,
    semdedup,
)
from .text_models import build_text_models, q_lm_score_from_model

# artifact subdirectory names under the models root — one frozen model
# family per directory, each with its own commit marker
TEXT_MODELS_DIR = "text_models"
CLASSIFIER_DIR = "classifier"
KMEANS_DIR = "kmeans"
ANN_DIR = "ann"
DEDUP_INDEX_DIR = "dedup_index"

ARTIFACT_ORDER = (
    TEXT_MODELS_DIR,
    CLASSIFIER_DIR,
    KMEANS_DIR,
    ANN_DIR,
    DEDUP_INDEX_DIR,
)


def build_corpus_artifacts(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    skip: tuple[str, ...] = (),
) -> dict:
    """Build EVERY persisted model artifact in dependency order under
    ``root`` (one subdirectory per family, committed via the shared
    marker protocol). Returns the manifest: per-artifact path, build
    seconds, and role. ``skip`` omits families by name (e.g. ``ann``
    on a text-only corpus).

    This is the maintenance job a 100 TB deployment schedules on a
    cadence; every query-side ``*_from_model`` form then probes these
    frozen artifacts with zero training work in the query path."""
    roles = {
        TEXT_MODELS_DIR: "LM/BM25 scoring + hybrid retrieval probes",
        CLASSIFIER_DIR: "quality keep-probability gate",
        KMEANS_DIR: "SemDeDup frozen clustering",
        ANN_DIR: "similarity / kNN / cluster probes",
        DEDUP_INDEX_DIR: "incremental ingest dedup (day-2 probe)",
    }
    unknown = set(skip) - set(ARTIFACT_ORDER)
    if unknown:
        raise ValueError(
            f"unknown artifact families in skip: {sorted(unknown)} "
            f"(valid: {list(ARTIFACT_ORDER)})"
        )
    manifest: dict = {"root": root, "artifacts": {}}
    for name in ARTIFACT_ORDER:
        if name in skip:
            continue
        path = os.path.join(root, name)
        t0 = time.monotonic()
        if name == TEXT_MODELS_DIR:
            build_text_models(spark, sf_dir, path)
        elif name == CLASSIFIER_DIR:
            build_classifier_model(spark, sf_dir, path)
        elif name == KMEANS_DIR:
            build_kmeans_model(spark, sf_dir, path)
        elif name == ANN_DIR:
            from .ann_index import build_ann_index

            build_ann_index(spark, sf_dir, path)
        elif name == DEDUP_INDEX_DIR:
            from .incremental_dedup import build_dedup_index

            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
            build_dedup_index(docs, path)
        manifest["artifacts"][name] = {
            "path": path,
            "seconds": round(time.monotonic() - t0, 3),
            "role": roles[name],
        }
    return manifest


def model_verdicts(
    spark: SparkSession, sf_dir: str, models: str | None = None
) -> dict[str, DataFrame]:
    """The three TRAINED curation verdict relations, computed corpus-
    wide (the same convention as the heuristic funnel's verdicts — the
    per-operator tests run on exactly these relations):

    - ``lm``:         (doc_id, lm_keep) — unigram-surprisal keep band
    - ``classifier``: (doc_id, cls_keep) — IRLS keep prediction
    - ``semantic``:   (doc_id, sem_drop) — SemDeDup DROPPED vectors
                      only (vec_id == doc_id; docs without embeddings
                      have no row and pass)

    ``models=None`` fits each model inside the relation (inline form);
    a models root probes the frozen artifacts. Both forms are pinned
    bit-identical per operator, so these verdicts — and therefore the
    whole curated funnel — agree row-for-row (funnel-level test)."""
    if models is None:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        lm = lm_scores(docs)
        train_docs = docs.filter(F.col("doc_id") % 5 != 0)
        weights, _ = train_classifier(
            spark, train_docs, prose_labels(train_docs)
        )
        cls = score_documents(docs, weights)
        sem = semdedup(load_table(spark, sf_dir, "embeddings"))
    else:
        lm = q_lm_score_from_model(
            spark, sf_dir, os.path.join(models, TEXT_MODELS_DIR)
        )
        cls = q_classifier_from_model(
            spark, sf_dir, os.path.join(models, CLASSIFIER_DIR)
        )
        sem = q_semdedup_from_model(
            spark, sf_dir, os.path.join(models, KMEANS_DIR), tau=SEMDEDUP_TAU
        )
    return {
        "lm": lm.select("doc_id", F.col("keep").alias("lm_keep")),
        "classifier": cls.select(
            "doc_id", F.col("predicted").alias("cls_keep")
        ),
        "semantic": sem.filter(~F.col("kept")).select(
            F.col("vec_id").alias("doc_id")
        ),
    }


def curated_stages(
    spark: SparkSession, sf_dir: str, models: str | None = None
) -> dict[str, DataFrame]:
    """The curated funnel as named stage relations: the heuristic
    stages (``funnel_stages``) plus ``after_lm`` / ``after_classifier``
    / ``after_semdedup`` and the shared layout ``final``. Each model
    gate is one doc_id-keyed semi/anti join against a corpus-wide
    verdict relation — same plumbing discipline as the heuristic
    funnel, so the stages stay independently checkable."""
    stages = funnel_stages(spark, sf_dir)
    v = model_verdicts(spark, sf_dir, models)

    s = stages["after_decontam"]
    s = s.join(v["lm"].filter("lm_keep").select("doc_id"), "doc_id", "left_semi")
    stages["after_lm"] = s
    s = s.join(
        v["classifier"].filter("cls_keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    stages["after_classifier"] = s
    s = s.join(v["semantic"], "doc_id", "left_anti")
    stages["after_semdedup"] = s

    # same stage boundary as the heuristic funnel: the layout tail's
    # two-phase ranks reference their input twice, so the survivor set
    # is materialized once before the mix -> shuffle -> pack chain
    stages["final"] = layout_stage(s.localCheckpoint(eager=False))
    return stages


def build_curated_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    models: str | None = None,
    records_per_file: int = 200,
    with_report: bool = True,
) -> dict:
    """Run the model-augmented funnel and write training shards.
    ``models=<root>`` consumes the frozen artifacts of
    ``build_corpus_artifacts`` (the production path — zero training in
    the run); ``models=None`` fits inline (the audit path). The report
    extends ``build_training_corpus``'s with the model-stage counts;
    monotone non-increasing by construction (pinned by test)."""
    stages = curated_stages(spark, sf_dir, models)

    def _n(df):
        return df.count() if with_report else None

    report: dict = {
        "input": _n(stages["train"]),
        "after_exact": _n(stages["after_exact"]),
        "after_near": _n(stages["after_near"]),
        "after_quality": _n(stages["after_quality"]),
        "after_decontam": _n(stages["after_decontam"]),
        "after_lm": _n(stages["after_lm"]),
        "after_classifier": _n(stages["after_classifier"]),
        "after_semdedup": _n(stages["after_semdedup"]),
        "from_models": models is not None,
    }
    write_training_shards(stages["final"], out_path, records_per_file)
    out = spark.read.parquet(out_path)
    report["rows_written"] = out.count()
    report["total_copies"] = out.agg(F.sum("n_copies")).collect()[0][0]
    import glob

    report["n_shard_files"] = len(
        glob.glob(os.path.join(out_path, "*.parquet"))
    )
    return report


def q_curated_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated funnel's final relation (inline fits, ``text``
    dropped) — one row per surviving training document with the full
    pack layout. NON-SQL-EXPRESSIBLE end to end (the classifier IRLS
    loop and the k-means fit iterate), so unregistered: the direct
    tests pin (a) inline == from-models row-for-row at sf0.001 and
    (b) stage reconciliation against the per-operator verdict counts;
    each constituent gate is separately oracle-checked or pinned by
    its own operator tests."""
    return curated_stages(spark, sf_dir)["final"].drop("text")


def curated_explain(
    spark: SparkSession, sf_dir: str, models: str | None = None
) -> DataFrame:
    """Per-document FIRST-DROP attribution for the CURATED funnel
    (VERDICT r07 #3) — ``q_funnel_explain`` extended through the three
    model gates, so a production curated run explains every removed
    document: (doc_id, lang, stage, kept) where stage is the first of
    ``eval_holdout`` / ``exact_dup`` / ``near_dup`` / ``low_quality`` /
    ``contaminated`` / ``lm_filtered`` / ``classifier_rejected`` /
    ``semantic_dup`` / ``zero_copies`` or ``kept``. Stage order matches
    ``curated_stages``' join order, so ``count(*) GROUP BY stage``
    reconciles exactly with ``build_curated_corpus``'s report deltas
    (pinned in tests/test_curated_corpus.py).

    Scale: the three model verdicts are the same corpus-wide relations
    the funnel's gates already broadcast; the attribution adds three
    more doc_id-keyed left joins onto the shared heuristic flag
    relation and one ``when`` chain — no new corpus pass."""
    flagged = heuristic_flags(spark, sf_dir)
    v = model_verdicts(spark, sf_dir, models)
    lm_keep = (
        v["lm"].filter("lm_keep")
        .select("doc_id", F.lit(True).alias("_lm_keep"))
    )
    cls_keep = (
        v["classifier"].filter("cls_keep")
        .select("doc_id", F.lit(True).alias("_cls_keep"))
    )
    sem_drop = v["semantic"].withColumn("_sem_drop", F.lit(True))
    flagged = (
        flagged.join(lm_keep, "doc_id", "left")
        .join(cls_keep, "doc_id", "left")
        .join(sem_drop, "doc_id", "left")
    ).localCheckpoint(eager=False)  # the widened flag relation feeds
    # the attribution chain AND the survivor set the mix is fit on
    surv = flagged.filter(
        ~(F.col("doc_id") % EVAL_MOD == EVAL_REM)
        & F.col("_exact_keep").isNotNull()
        & F.col("_near_drop").isNull()
        & F.col("_qual_keep").isNotNull()
        & F.col("_contam").isNull()
        & F.col("_lm_keep").isNotNull()
        & F.col("_cls_keep").isNotNull()
        & F.col("_sem_drop").isNull()
    ).select("doc_id", "lang")
    # the temperature mix is fit on the CURATED survivor set, exactly
    # as layout_stage runs it inside build_curated_corpus
    mixed = temperature_mix(surv, "lang", "doc_id").select(
        "doc_id", "n_copies"
    )
    stage = (
        F.when(F.col("doc_id") % EVAL_MOD == EVAL_REM, "eval_holdout")
        .when(F.col("_exact_keep").isNull(), "exact_dup")
        .when(F.col("_near_drop").isNotNull(), "near_dup")
        .when(F.col("_qual_keep").isNull(), "low_quality")
        .when(F.col("_contam").isNotNull(), "contaminated")
        .when(F.col("_lm_keep").isNull(), "lm_filtered")
        .when(F.col("_cls_keep").isNull(), "classifier_rejected")
        .when(F.col("_sem_drop").isNotNull(), "semantic_dup")
        .when(F.col("n_copies") < 1, "zero_copies")
        .otherwise("kept")
    )
    return flagged.join(mixed, "doc_id", "left").select(
        "doc_id", "lang", stage.alias("stage"),
        (stage == "kept").alias("kept"),
    )


def q_curated_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline-fit form of :func:`curated_explain` (non-SQL-expressible
    end to end — the classifier IRLS loop and k-means fit iterate —
    so unregistered; the reconciliation test is the correctness
    gate)."""
    return curated_explain(spark, sf_dir)


UNREGISTERED_CURATED_QUERIES = {
    "q_curated_funnel": q_curated_funnel,
    "q_curated_explain": q_curated_explain,
}
