"""Day-2 incremental ingest: the composed production cycle.

``build_corpus_artifacts`` + ``build_curated_corpus`` are the DAY-1
story — fit the models, run the funnel, ship the corpus. What a 100 TB
deployment does every day AFTER that is different: a new batch lands
every trigger and must flow

    dedup against the FROZEN fingerprint index   (no history rescan)
    -> ingest-time hygiene gate (secret scan, leak rows quarantined)
    -> corpus append (unit-scoped, exactly-once)
    -> fingerprint-index append (same unit)
    -> rollup refresh (partial-agg unit, manifest commit)
    -> serving-table upsert (curated rows queryable at a snapshot)

Each piece exists and is tested alone (``incremental_dedup``,
``secret_scan``, ``update_rollup``/``rollup_stream_writer``,
``ServingTable``); this module composes them into ONE ``foreachBatch``
cycle with a single end-to-end exactly-once argument:

- The dedup-index unit marker is the LAST effect of the batch. Every
  earlier effect is idempotent under replay: the scan report and the
  out-corpus unit OVERWRITE their batch-scoped directories, the rollup
  unit is skipped when its manifest entry exists, and the serving
  upsert merges by (key, seq=batch_id) so a replayed row ties with
  itself.
- A crash BEFORE the marker therefore replays into identical state; a
  crash AFTER the marker is skipped wholesale by the ever-published
  guard (``marker_state`` — committed or superseded), because every
  other effect is already down (the marker being last implies it).

Quarantined docs (any secret-like hit) enter NEITHER the corpus NOR
the index: if the same text re-arrives it is re-kept and re-quarantined
— deterministic, and the right call (history should not "contain" rows
the corpus refused). Reconciliation against a from-scratch rebuild is
pinned by ``test_day2_incremental_ingest_end_to_end``; the operator
runbook section is ``docs/RUNBOOK_100TB.md`` § "Day 2".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental_dedup import build_dedup_index, incremental_dedup
from ..operators.redaction import secret_scan
from ..sources import commit_protocol
from ..sources.rollup import rollup_stream_writer
from .serving import ServingTable

DAY2_ROLLUP_NAME = "by_lang"


def day2_ingest_writer(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    rollup_path: str,
    scan_path: str,
    serving: ServingTable,
    effect_hook=None,
):
    """``foreachBatch`` callable running the full day-2 cycle on each
    micro-batch of (doc_id, lang, text) rows. ``serving`` must be keyed
    on ``doc_id`` with ``seq_col="seq"``. Wire it with::

        stream.writeStream.foreachBatch(
            day2_ingest_writer(spark, ix, out, roll, scan, table)
        ).option("checkpointLocation", ckpt)

    ``effect_hook(stage, batch_id)`` is a FAULT-INJECTION point called
    after each effect lands (stages ``scan_written`` /
    ``corpus_written`` / ``rollup_done`` / ``serving_done``) — the
    crash-matrix test (VERDICT r09 #4) raises from it to kill the
    cycle between every adjacent effect pair and then proves the
    replay converges. Production leaves it None; it exists precisely
    so the exactly-once argument is TESTED at each seam instead of
    asserted."""
    rollup_write = rollup_stream_writer(
        spark, rollup_path, DAY2_ROLLUP_NAME, ["lang"], "n_chars"
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        unit = f"b{batch_id:06d}"
        # ever-published guard (committed or superseded): the index
        # marker is this cycle's LAST effect, so its existence proves
        # the whole batch landed — replay skips wholesale
        names, superseded = commit_protocol.marker_state(index_path)
        if unit in names or unit in superseded:
            return

        report = incremental_dedup(spark, batch_df, index_path)
        kept = batch_df.join(
            report.filter(F.col("status") == "kept").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        scan = secret_scan(kept).persist()
        clean = kept.join(
            scan.filter(F.col("n_secret_like") > 0).select("doc_id"),
            "doc_id",
            "left_anti",
        ).persist()
        try:
            # 1. hygiene report (overwrite: idempotent)
            scan.write.mode("overwrite").parquet(
                os.path.join(scan_path, f"batch={unit}")
            )
            if effect_hook is not None:
                effect_hook("scan_written", batch_id)
            # 2. corpus unit (overwrite: idempotent)
            clean.write.mode("overwrite").parquet(
                os.path.join(out_path, f"unit={unit}")
            )
            if effect_hook is not None:
                effect_hook("corpus_written", batch_id)
            # 3. rollup refresh (skips if its manifest unit exists)
            rollup_write(
                clean.select("lang", F.length("text").alias("n_chars")),
                batch_id,
            )
            if effect_hook is not None:
                effect_hook("rollup_done", batch_id)
            # 4. serving upsert (seq = batch id: replays tie with
            # themselves in the max-seq merge)
            serving.upsert(
                clean.select(
                    "doc_id",
                    "lang",
                    F.length("text").alias("n_chars"),
                    F.lit(batch_id).cast("long").alias("seq"),
                )
            )
            if effect_hook is not None:
                effect_hook("serving_done", batch_id)
            # 5. index unit + marker — the commit point of the batch
            build_dedup_index(
                clean.select("doc_id", "text"),
                index_path,
                mode="append",
                unit=unit,
            )
        finally:
            clean.unpersist()
            scan.unpersist()

    return _process
