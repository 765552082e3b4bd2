"""Unified day-2 corpus ingest — ONE batch through the FULL curated
funnel against frozen artifacts and persisted indexes (VERDICT r11
#2/#4: every dedup family had its incremental twin — text
``incremental_dedup``, URLs ``ingest_url_batch``, embeddings
``ingest_embedding_batch``, the crawl front door ``crawl_batch_ingest``
— but no single cycle composed them; this module is that composition).

One call = one micro-batch of crawled WARC files advancing the WHOLE
deployment:

    WARC bytes ──crawl_batch_ingest──> kept pages        (crawl stores)
      -> incremental text dedup (exact + banded MinHash vs the
         persisted fingerprint index + in-batch first-wins)
      -> heuristic quality gate        (quality_profile — pure)
      -> decontamination               (vs the static benchmark
                                        holdout — pure join)
      -> frozen LM surprisal gate      (stored unigram model)
      -> frozen classifier gate        (stored IRLS weights)
      -> semantic dedup + ANN advance  (ingest_embedding_batch:
         verdicts vs the persisted ANN index, kept vectors append
         assignments/PQ codes/kNN edges in one unit)
      -> curated store                 (kept docs land under the
                                        batch's unit, marker LAST)

Transaction discipline — COORDINATED MARKER-LAST UNITS, not one giant
transaction: each durable stage is an EXISTING crash-tested primitive
committing its own unit (all keyed by the same ``b<batch_id>`` label)
in a FIXED order, and every stage is independently replay-convergent:

- published stages skip (the ever-published guard) or overwrite their
  unit idempotently, recovering their outputs from the store;
- verdict computations are REPLAY-STABLE at any crash point because
  every index probe excludes the batch's own unit label
  (``exclude_unit`` — the ``ingest_url_batch`` discipline, now
  threaded through ``incremental_dedup`` too);
- the curated marker commits LAST, so a batch visible in the curated
  store implies every upstream store already published it.

The crash matrix (tests/test_corpus_ingest.py) kills between every
adjacent durable-effect pair — the crawl stage's internal seams plus
every stage boundary — and pins replay convergence to the
never-crashed state; the reconciliation test pins N sequential
doc_id-ordered batches ≡ one batch over the union (exact under
ordered arrival; out-of-order arrival differs only by the documented
first-occurrence-wins rule every dedup family shares).

Scale: every stage is O(batch) against broadcast-sized models or
semi-joined index slices — history is NEVER rescanned (the probe
disciplines of the constituent operators, unchanged). Reference
parity: none (the 412-LoC reference has no curation tier);
BASELINE.json north-star — the live 100 TB training-data front door.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import commit_protocol
from ..sources.loader import load_table
from .classifier import score_documents
from .contamination import EVAL_MOD, EVAL_REM, contamination_report
from .crawl_funnel import crawl_batch_ingest
from .incremental_dedup import build_dedup_index, incremental_dedup
from .lm_score import lm_scores
from .quality import quality_profile

CRAWL_IX = "crawl_index"
CRAWL_OUT = "crawl_out"
DEDUP_IX = "dedup_index"
DEDUP_OUT = "dedup_out"
CURATED = "curated"

_PAGE_SCHEMA = "doc_id long, url string, content string"


def _unit(batch_id: int) -> str:
    return f"b{batch_id:06d}"


def ingest_corpus_batch(
    spark: SparkSession,
    warc_batch: DataFrame,
    batch_id: int,
    rules: DataFrame,
    embeddings: DataFrame,
    models_root: str,
    ann_index: str,
    root: str,
    effect_hook=None,
) -> DataFrame:
    """Run one WARC micro-batch through the full curated cycle.

    - ``warc_batch``: (doc_id, warc binary) — the crawl front door's
      wire shape.
    - ``rules``: the parsed robots relation (host, rule_type, prefix).
    - ``embeddings``: (vec_id, embedding) source for the batch's
      docs (vec_id == doc_id; docs without a vector PASS the semantic
      gate, the ``curated_stages`` convention).
    - ``models_root``: the frozen ``build_corpus_artifacts`` root
      (text_models + classifier are read; training never runs here).
    - ``ann_index``: the persisted ANN index ``build_ann_index`` built
      (advanced by the batch's kept vectors).
    - ``root``: this deployment's ingest stores — crawl_index,
      crawl_out, dedup_index, dedup_out, curated, each advancing by
      one unit per batch.
    - ``effect_hook(stage, batch_id)``: fault-injection seam after
      each durable effect, in order: the crawl stage's own
      ``kept_written``/``canon_written`` (inside crawl_batch_ingest),
      then ``crawl_committed``, ``dedup_out_written``,
      ``dedup_committed``, ``embed_committed``, ``curated_written`` —
      the curated marker is last and needs no hook after it.

    Returns the batch report: (doc_id, stage, kept) — first-drop
    attribution with stage ∈ crawl_dropped / exact_dup / near_dup /
    low_quality / contaminated / lm_filtered / classifier_rejected /
    semantic_dup / kept. Deterministic at ANY crash/replay point
    (every probe excludes the batch's own unit)."""
    from .ann_index import ingest_embedding_batch

    unit = _unit(batch_id)
    crawl_ix = os.path.join(root, CRAWL_IX)
    crawl_out = os.path.join(root, CRAWL_OUT)
    dedup_ix = os.path.join(root, DEDUP_IX)
    dedup_out = os.path.join(root, DEDUP_OUT)
    curated = os.path.join(root, CURATED)

    # ---- stage 1: crawl front door (its own 3-seam unit transaction;
    # skips wholesale if the unit ever published)
    crawl_batch_ingest(
        spark, warc_batch, batch_id, rules, crawl_ix, crawl_out,
        effect_hook=effect_hook,
    )
    if effect_hook is not None:
        effect_hook("crawl_committed", batch_id)
    # the stage's kept pages, read back from the committed store (the
    # replay-safe source whether this call wrote them or a pre-crash
    # attempt did)
    pages = spark.read.schema(_PAGE_SCHEMA).parquet(
        os.path.join(crawl_out, f"unit={unit}")
    )
    docs = pages.select("doc_id", F.col("content").alias("text"))

    # ---- stage 2: incremental text dedup (probe excludes own unit →
    # replay-stable verdicts; writes skip if published)
    # NOT checkpointed: the returned report rides these verdicts (the
    # lifecycle convention — a checkpoint here could never be
    # released); batch-sized recompute per consumer is the trade
    text_verdicts = incremental_dedup(
        spark, docs, dedup_ix, exclude_unit=unit
    )
    names, superseded = commit_protocol.marker_state(dedup_ix)
    if unit in superseded:
        raise RuntimeError(
            f"ingest_corpus_batch: dedup unit {unit!r} was compacted away; "
            "re-ingest under a FRESH batch id instead of replaying."
        )
    if unit not in names:
        docs.join(
            text_verdicts.filter(F.col("status") == "kept").select("doc_id"),
            "doc_id",
            "left_semi",
        ).write.mode("overwrite").parquet(
            os.path.join(dedup_out, f"unit={unit}")
        )
        if effect_hook is not None:
            effect_hook("dedup_out_written", batch_id)
        build_dedup_index(
            spark.read.schema("doc_id long, text string").parquet(
                os.path.join(dedup_out, f"unit={unit}")
            ),
            dedup_ix,
            mode="append",
            unit=unit,
        )
    if effect_hook is not None:
        effect_hook("dedup_committed", batch_id)
    # STAGE BOUNDARY (the funnel_stages discipline, materialized in
    # STORAGE instead of a checkpoint — crash-safe AND leak-free): the
    # gate chain below references the dedup survivors once per gate
    # verdict AND once per semi-join; chaining those subtrees onto the
    # full incremental_dedup plan blew Catalyst's expression trees up
    # measurably (the driver burned minutes in Expression.toString on
    # the composed plan). The survivors were just durably written —
    # re-read them so every downstream plan starts at a parquet leaf.
    text_kept = spark.read.schema("doc_id long, text string").parquet(
        os.path.join(dedup_out, f"unit={unit}")
    )

    # ---- stage 3: pure gates (no durable effects — recompute freely).
    # FLAT FLAGS, not a chained survivor relation (r14, guide §2.4/7.3
    # — the heuristic_flags discipline from corpus_pipeline.py): every
    # gate verdict here is PER-DOCUMENT against frozen state (Gopher
    # battery: per-doc; contamination: per-doc vs the frozen holdout,
    # whose ubiquity cutoff derives from the EVAL side only; LM keep
    # band: per-doc surprisal under the frozen unigram model;
    # classifier: per-doc margin under frozen weights), so computing
    # each flag over ``text_kept`` and folding with boolean algebra is
    # row-for-row identical to the old gate-on-survivors chain — but
    # the old chain DOUBLED the plan per gate (survivors ⋈ verdict(
    # survivors) re-instantiates the whole prefix on both sides: 2⁴
    # text_kept subtrees in after_cls, ~2⁶ in the curated write), and
    # every downstream action re-planned and re-broadcast that
    # exponential tree (measured sf0.001: ONE 2-doc batch = 125 s /
    # 167 jobs; flat = linear plans). At 100 TB the blow-up is driver
    # planning time per micro-batch — the same Catalyst-tree cost the
    # storage boundary above already bounds for the dedup stage.
    holdout = _eval_holdout(spark, models_root)
    commit_protocol.require_marker(
        os.path.join(models_root, "text_models"),
        what="text models", builder="build_text_models",
    )
    commit_protocol.require_marker(
        os.path.join(models_root, "classifier"),
        what="classifier model", builder="build_classifier_model",
    )
    freq = spark.read.parquet(
        os.path.join(models_root, "text_models", "unigram")
    )
    totals = spark.read.parquet(
        os.path.join(models_root, "text_models", "unigram_totals")
    )
    weights = spark.read.parquet(
        os.path.join(models_root, "classifier", "weights")
    )
    q_flag = (
        quality_profile(text_kept).filter("keep")
        .select("doc_id", F.lit(True).alias("_qual"))
    )
    contam_flag = (
        contamination_report(text_kept, holdout)
        .filter("contaminated")
        .select("doc_id", F.lit(True).alias("_contam"))
    )
    lm_flag = (
        lm_scores(text_kept, freq=freq, totals=totals)
        .filter("keep")
        .select("doc_id", F.lit(True).alias("_lm"))
    )
    cls_flag = (
        score_documents(text_kept, weights)
        .filter("predicted")
        .select("doc_id", F.lit(True).alias("_cls"))
    )
    flagged = (
        text_kept.select("doc_id")
        .join(q_flag, "doc_id", "left")
        .join(contam_flag, "doc_id", "left")
        .join(lm_flag, "doc_id", "left")
        .join(cls_flag, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_qual", F.lit(False)).alias("_qual"),
            F.coalesce("_contam", F.lit(False)).alias("_contam"),
            F.coalesce("_lm", F.lit(False)).alias("_lm"),
            F.coalesce("_cls", F.lit(False)).alias("_cls"),
        )
    )
    after_cls = flagged.filter(
        F.col("_qual") & ~F.col("_contam") & F.col("_lm") & F.col("_cls")
    ).select("doc_id")

    # ---- stage 4: semantic dedup + ANN advance (one committed unit;
    # ingest_embedding_batch carries its own replay/superseded guards)
    batch_vecs = embeddings.join(
        after_cls.select(F.col("doc_id").alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    sem_verdicts = ingest_embedding_batch(
        spark, batch_vecs, ann_index, unit=unit
    )
    if effect_hook is not None:
        effect_hook("embed_committed", batch_id)
    sem_drop = sem_verdicts.filter(F.col("status") == "near_dup").select(
        F.col("vec_id").alias("doc_id")
    )
    final = after_cls.join(sem_drop, "doc_id", "left_anti")

    # ---- stage 5: curated store, marker LAST
    names_c, _sup_c = commit_protocol.marker_state(curated)
    if unit not in names_c:
        pages.join(final.select("doc_id"), "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(os.path.join(curated, f"unit={unit}"))
        if effect_hook is not None:
            effect_hook("curated_written", batch_id)
        commit_protocol.commit_unit(curated, unit)

    # ---- the report: first-drop attribution over the whole batch
    # first-drop attribution straight off the flag relation (identical
    # sets to the old chained anti-joins: each stage's membership is
    # "passed every earlier gate, failed this one")
    stage_sets = [
        ("exact_dup", text_verdicts.filter("status = 'exact_dup'")
         .select("doc_id")),
        ("near_dup", text_verdicts.filter("status = 'near_dup'")
         .select("doc_id")),
        ("low_quality", flagged.filter(~F.col("_qual")).select("doc_id")),
        ("contaminated", flagged.filter(
            F.col("_qual") & F.col("_contam")).select("doc_id")),
        ("lm_filtered", flagged.filter(
            F.col("_qual") & ~F.col("_contam") & ~F.col("_lm")
        ).select("doc_id")),
        ("classifier_rejected", flagged.filter(
            F.col("_qual") & ~F.col("_contam") & F.col("_lm")
            & ~F.col("_cls")
        ).select("doc_id")),
        ("semantic_dup", sem_drop),
    ]
    attributed = None
    for name, rel in stage_sets:
        tagged = rel.select("doc_id", F.lit(name).alias("stage"))
        attributed = tagged if attributed is None else attributed.unionByName(
            tagged
        )
    kept_rows = final.select(
        "doc_id", F.lit("kept").alias("stage")
    )
    # crawl_dropped = batch docs that never reached the dedup stage
    crawl_dropped = (
        warc_batch.select("doc_id")
        .join(pages.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit("crawl_dropped").alias("stage"))
    )
    report = crawl_dropped.unionByName(attributed).unionByName(kept_rows)
    return report.select(
        "doc_id", "stage", (F.col("stage") == "kept").alias("kept")
    )


def _eval_holdout(spark: SparkSession, models_root: str) -> DataFrame:
    """The static benchmark suite the decontamination gate protects —
    persisted next to the models at build time (``freeze_holdout``),
    read back here so the day-2 cycle never rescans the reference
    corpus."""
    p = os.path.join(models_root, "eval_holdout")
    return spark.read.schema("doc_id long, text string").parquet(p)


def freeze_holdout(spark: SparkSession, sf_dir: str, models_root: str) -> None:
    """Persist the benchmark holdout (``doc_id % EVAL_MOD == EVAL_REM``
    — the q_decontaminate rule) under the models root; the day-2
    decontamination gate joins incoming batches against this frozen
    relation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.filter(F.col("doc_id") % EVAL_MOD == EVAL_REM).write.mode(
        "overwrite"
    ).parquet(os.path.join(models_root, "eval_holdout"))


def read_curated_batches(spark: SparkSession, root: str) -> DataFrame:
    """The curated corpus over COMMITTED units only (doc_id, url,
    content) — a unit is visible iff its curated marker landed, which
    (marker-last ordering) implies every upstream store published it."""
    curated = os.path.join(root, CURATED)
    units = commit_protocol.committed_units(curated)
    if not units:
        return spark.createDataFrame([], _PAGE_SCHEMA)
    return spark.read.schema(_PAGE_SCHEMA).parquet(
        *[os.path.join(curated, f"unit={u}") for u in units]
    )


def corpus_ingest_writer(
    spark: SparkSession,
    warc_stream: DataFrame,
    rules: DataFrame,
    embeddings: DataFrame,
    models_root: str,
    ann_index: str,
    root: str,
    checkpoint: str,
):
    """Streaming closure: foreachBatch over a (doc_id, warc binary)
    stream, one ``ingest_corpus_batch`` cycle per trigger — the live
    100 TB training-data front door. Returns the configured
    writeStream (caller picks the trigger and starts it)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_corpus_batch(
            spark, batch_df, batch_id, rules, embeddings, models_root,
            ann_index, root,
        )

    return (
        warc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
