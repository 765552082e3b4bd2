"""Incremental dedup: new batches against a PERSISTED fingerprint index.

`q_dedup_exact` / `q_dedup_minhash_banded` dedup a corpus against
itself — an O(corpus) batch job. The question a production operator
actually asks at 100 TB is different: a new ingest batch arrives every
trigger; is each document a duplicate of anything in the 100 TB of
HISTORY, without rescanning that history? The lakehouse answer is a
compact on-disk index updated as data lands:

- ``exact``:  one row per distinct sha256 with its canonical doc —
  membership is an equi-join on the hash, O(|batch|) probe work.
- ``bands``:  the MinHash-LSH banding of history, stored EXPLODED as
  (band, key, doc_id, sig) and partitioned by band — an incoming doc
  joins only the band keys it shares (partition-pruned, never a scan),
  and the 16-component signature rides along so candidate
  verification needs NO second lookup.

Near-dup verification uses the standard signature-agreement estimate
(matching minhash components / 16 ≈ Jaccard — the MMDS bound): exact
shingle-set verification would require storing every document's
shingle set (comparable to the corpus itself), while signatures are
fixed 136 bytes per doc. Same constants as the batch operator
(SHINGLE_K=5, 16 hashes, 8 bands × 2 rows, τ=0.5), so a pair the
batch job verifies is a candidate here with the published LSH
probability.

The index grows by APPEND: ``build_dedup_index`` over each landed
batch after filtering (mode="append") — both tables are insert-only
under first-occurrence-wins, no rewrite of existing rows.

Scale notes: the exact probe is one shuffle of the batch's hashes
(the index side is pre-bucketable by sha); the band probe shuffles
|batch| × 8 band rows against a partition-pruned index slice; no
stage touches unmatched history. All hashing is the engine-portable
md5-window family shared with ``operators/dedup.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import shingles_k, tokenize
from .dedup import JACCARD_THRESHOLD, MINHASH_BANDS, MINHASH_N, MINHASH_R, SHINGLE_K


def _sigs(docs: DataFrame) -> DataFrame:
    """(doc_id, sha, sig[16]) — sha256 of the raw text plus the MinHash
    signature of the distinct shingle set. One narrow projection (the
    let-bound shingling idiom); shingle-less docs get a NULL sig and
    participate only in exact matching."""
    ss = F.element_at(
        F.transform(
            F.array(tokenize(F.col("text"))),
            lambda toks: shingles_k(toks, SHINGLE_K),
        ),
        1,
    )
    digs = F.transform(
        "_ss",
        lambda s: F.struct(
            *[
                F.md5(F.concat(F.lit(f"{g}:"), s)).alias(f"g{g}")
                for g in range(MINHASH_N // 4)
            ]
        ),
    )

    def _min_hash(i: int):
        return F.array_min(
            F.transform(
                "_digs",
                lambda d: F.conv(
                    F.substring(d[f"g{i // 4}"], 8 * (i % 4) + 1, 8), 16, 10
                ).cast("long"),
            )
        )

    sig = F.array(*[_min_hash(i) for i in range(MINHASH_N)])
    return (
        docs.select(
            "doc_id", F.sha2(F.col("text"), 256).alias("sha"), ss.alias("_ss")
        )
        .withColumn("_digs", digs)
        .select(
            "doc_id",
            "sha",
            F.when(F.size("_ss") > 0, sig).alias("sig"),
        )
    )


def _band_rows(sigs: DataFrame) -> DataFrame:
    """Explode a signature relation into (band, key, doc_id, sig)."""
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-",
                *[
                    F.element_at("sig", b * MINHASH_R + j + 1).cast("string")
                    for j in range(MINHASH_R)
                ],
            ).alias("key"),
        )
        for b in range(MINHASH_BANDS)
    ]
    return (
        sigs.filter(F.col("sig").isNotNull())
        .select("doc_id", "sig", F.explode(F.array(*bands)).alias("bk"))
        .select(
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
            "doc_id",
            "sig",
        )
    )


def build_dedup_index(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize (or append to) the fingerprint index for ``docs``.
    ``mode="append"`` is the incremental maintenance path: both tables
    are insert-only, so each landed batch appends its own fingerprints
    after it has itself been deduped."""
    s = _sigs(docs)
    s.select("sha", "doc_id").groupBy("sha").agg(
        F.min("doc_id").alias("canonical_id")
    ).write.mode(mode).parquet(os.path.join(path, "exact"))
    _band_rows(s).write.mode(mode).partitionBy("band").parquet(
        os.path.join(path, "bands")
    )


def incremental_dedup(
    spark: SparkSession, new_docs: DataFrame, index_path: str
) -> DataFrame:
    """Classify each incoming doc against the index: ``exact_dup``
    (sha256 present, including a dup WITHIN the batch — first
    occurrence by doc_id wins), ``near_dup`` (shares an LSH band with a
    history doc and signature agreement ≥ τ; best match reported), or
    ``kept``. Returns (doc_id, status, matched_id, est_jaccard).

    In-batch NEAR dups are out of scope here by design — the landed
    batch is itself deduped by the batch operator before its
    fingerprints append to the index."""
    # Re-aggregate at probe time: the index grows by blind APPEND (and a
    # replayed micro-batch may append the same fingerprints twice), so
    # the same sha can occur in several index files. min() restores the
    # one-canonical-per-sha invariant and keeps the left join 1:1 —
    # duplicate appends can never multiply probe rows. Band rows need no
    # such guard (the best-match groupBy absorbs duplicates).
    exact_ix = (
        spark.read.parquet(os.path.join(index_path, "exact"))
        .groupBy("sha")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )
    bands_ix = spark.read.parquet(os.path.join(index_path, "bands"))

    s = _sigs(new_docs)
    # exact: vs index, then first-occurrence-wins inside the batch
    vs_ix = s.join(
        exact_ix.withColumnRenamed("canonical_id", "ix_id"), "sha", "left"
    )
    vs_ix = vs_ix.withColumn(
        "first_in_batch", F.min("doc_id").over(W.partitionBy("sha"))
    )
    exact_dup = (
        (F.col("ix_id").isNotNull())
        | (F.col("doc_id") > F.col("first_in_batch"))
    )
    exact_match = F.coalesce(F.col("ix_id"), F.col("first_in_batch"))

    survivors = vs_ix.filter(~exact_dup).select("doc_id", "sig")
    # near: probe only the band keys the batch actually carries
    probe = _band_rows(survivors.select("doc_id", "sig"))
    cand = probe.join(
        bands_ix.select(
            "band",
            "key",
            F.col("doc_id").alias("old_id"),
            F.col("sig").alias("old_sig"),
        ),
        ["band", "key"],
    )
    agree = F.size(
        F.filter(F.zip_with("sig", "old_sig", lambda a, b: a == b), lambda x: x)
    )
    est = (agree / F.lit(float(MINHASH_N))).alias("est_jaccard")
    best = (
        cand.select("doc_id", F.col("old_id"), est)
        .filter(F.col("est_jaccard") >= JACCARD_THRESHOLD)
        .groupBy("doc_id")
        .agg(
            F.max_by("old_id", F.struct("est_jaccard", (-F.col("old_id")).alias("nid"))).alias(
                "near_id"
            ),
            F.max("est_jaccard").alias("est_jaccard"),
        )
    )
    out = (
        vs_ix.select(
            "doc_id",
            exact_dup.alias("is_exact"),
            exact_match.alias("exact_id"),
        )
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("near_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.when(F.col("is_exact"), F.col("exact_id"))
            .otherwise(F.col("near_id"))
            .alias("matched_id"),
            F.when(
                (~F.col("is_exact")) & F.col("near_id").isNotNull(),
                F.round("est_jaccard", 6),
            ).alias("est_jaccard"),
        )
    )
    return out


def dedup_stream_writer(
    spark: SparkSession,
    doc_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
):
    """Streaming closure of the incremental-dedup cycle: every
    micro-batch is classified against the index, ``kept`` docs land in
    ``out_path``, and THEIR fingerprints append to the index — so a
    duplicate arriving in a LATER trigger is dropped against history
    that includes earlier triggers. Returns the configured writeStream
    (caller picks the trigger and starts it).

    Exactly-once: the parquet appends are not transactional with the
    checkpoint, so a crash between append and commit replays the batch.
    Both appends are REPLAY-SAFE by construction — the probe
    re-aggregates the exact index (duplicate fingerprints collapse to
    the same canonical), and re-appending the same kept docs only adds
    rows that dedup to identical probe results. Classifications never
    change under replay; at most the out_path needs the same
    re-aggregation on read (first occurrence by doc_id), the usual
    foreachBatch idempotence contract (cf. ServingTable's versioned
    commit for the stronger guarantee)."""

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        report = incremental_dedup(spark, batch_df, index_path)
        kept = batch_df.join(
            report.filter(F.col("status") == "kept").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        kept.write.mode("append").parquet(out_path)
        build_dedup_index(kept, index_path, mode="append")

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
