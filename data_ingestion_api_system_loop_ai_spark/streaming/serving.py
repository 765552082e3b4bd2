"""Serving table: the reference's ``ingestionStore`` dict as a table.

The reference keeps request/batch state in a process-global JS object
(``ingestController.js:5``) — lost on restart, readable only in-process.
The engine's equivalent is a KEYED SERVING TABLE maintained by the
streaming layer and read by the status surface:

- ``ServingTable`` is a versioned, KEY-HASH-BUCKETED parquet table.
  Rows live in ``v=<n>/bucket=<b>/`` directories, where ``b =
  pmod(hash(key), num_buckets)``. Every commit writes new directories
  ONLY for the buckets the micro-batch touched, records a manifest
  (bucket -> version of its current directory) inside the new version
  directory, and atomically swaps a pointer file (``os.replace``) —
  readers always see a complete version, never a half-written
  directory; a crash mid-commit leaves the previous version live.
  (The same commit protocol, scaled up, is what lakehouse table
  formats provide; on object storage the pointer swap maps to a
  conditional PUT, and the manifest is the moral equivalent of a
  MERGE's copy-on-write file rewrite scoped to touched files.)
- ``upsert`` merges a micro-batch by key, keeping the row with the
  highest sequence per key. Micro-batch REPLAY (foreachBatch re-delivers
  after restart) is therefore idempotent: replayed rows lose the max-seq
  tie-break against themselves and nothing changes.
- ``delete`` is a TOMBSTONE upsert (same max-seq merge, marker row):
  replay-idempotent, revivable by a later higher-seq write, filtered
  by the read surface, emitted as a liveness transition by the change
  feed, and preserved across rebucketing.
- ``attach_serving_sink`` wires a drain stream into the table via
  ``foreachBatch``.

Scale notes: a micro-batch of k keys reads and rewrites only the
buckets those keys hash to — O(touched buckets), NOT O(table), per
trigger (the round-2 full-table rewrite was the classic copy-on-write
failure mode at 100 TB of request state). The merge shuffles only the
touched buckets' rows plus the micro-batch, keyed (AQE broadcasts the
micro-batch side when small); a full-key point lookup reads exactly
one bucket directory. ``num_buckets`` sizes the rewrite granularity:
at production scale pick buckets so one bucket ~ a few hundred MB
(e.g. 2^14 buckets for 10 TB of state). Old versions are vacuumed
once no retained manifest references them.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.commit_protocol import atomic_write_text

_POINTER = "_LATEST"
_MANIFEST = "_MANIFEST.json"
_CONFIG = "_TABLE_CONFIG.json"
# partition-directory column; NOT underscore-prefixed because Spark's
# file listing treats `_*` directories as hidden and would skip them
BUCKET_COL = "bucket"
# row-level delete marker: deletes are TOMBSTONE upserts (a row whose
# marker is true wins the max-seq merge like any other row, making
# deletes replay-idempotent and revivable by a later higher-seq
# upsert); the read surface (current/lookup) filters them, the raw
# surface (time travel with include_tombstones, change_feed) sees them
TOMBSTONE_COL = "ss_deleted"


class ConcurrentWriteConflict(RuntimeError):
    """Another writer claimed the version this writer was about to
    commit; re-read the table state and retry the operation."""


class ServingTable:
    """Keyed, versioned, hash-bucketed parquet serving table with
    atomic manifest commits and bucket-scoped upserts."""

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        seq_col: str,
        keep_versions: int = 3,
        num_buckets: int = 16,
        bucket_cols: list[str] | None = None,
    ) -> None:
        """``key_cols`` identify a row for the max-seq merge;
        ``bucket_cols`` (default: the key) choose the PLACEMENT hash.
        Bucketing by an access-pattern prefix of the key — e.g. rows
        keyed by batch_id but bucketed by request_id — co-locates every
        row a read will want in ONE bucket directory, so the read is
        O(bucket) without a secondary index. ``bucket_cols`` must be a
        function of the row (present in every upserted batch)."""
        self.path = path
        self.key_cols = list(key_cols)
        self.seq_col = seq_col
        self.keep_versions = keep_versions
        self.num_buckets = num_buckets
        self.bucket_cols = list(bucket_cols) if bucket_cols else self.key_cols
        os.makedirs(path, exist_ok=True)
        # placement parameters are PINNED on first commit: a reader (or
        # a restarted writer) opening an existing table inherits the
        # on-disk key/bucket/seq configuration — a mismatched guess
        # would prune lookups to the wrong bucket or split merge keys
        try:
            with open(os.path.join(path, _CONFIG)) as f:
                cfg = json.load(f)
            self.key_cols = cfg["key_cols"]
            self.seq_col = cfg["seq_col"]
            self.num_buckets = cfg["num_buckets"]
            self.bucket_cols = cfg["bucket_cols"]
        except FileNotFoundError:
            pass
        # lookup()'s literal-cast types, cached per version (ADVICE
        # r09: one parquet footer read per point lookup otherwise)
        self._key_types_cache: tuple[int, dict] | None = None

    def _save_config(self) -> None:
        cfg_path = os.path.join(self.path, _CONFIG)
        if not os.path.exists(cfg_path):
            atomic_write_text(
                cfg_path,
                json.dumps(
                    {
                        "key_cols": self.key_cols,
                        "seq_col": self.seq_col,
                        "num_buckets": self.num_buckets,
                        "bucket_cols": self.bucket_cols,
                    }
                ),
            )

    # -- commit protocol ---------------------------------------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.path, _POINTER)

    def latest_version(self) -> int:
        try:
            with open(self._pointer_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _commit(self, version: int) -> None:
        # atomic pointer swap — the shared rename primitive
        atomic_write_text(self._pointer_file(), str(version))

    def _claim_version(self, version: int) -> None:
        """Optimistic concurrency: atomically claim a version number
        (O_CREAT|O_EXCL claim file) BEFORE doing any merge work. Two
        writers racing on the same store — two drains, or a drain and a
        maintenance pass — both read latest v and would both write
        v+1, the second silently clobbering the first's directories
        and manifest; with the claim, exactly one wins and the loser
        raises ``ConcurrentWriteConflict`` to retry against the
        winner's commit. On object storage the same role is played by
        a conditional PUT on the pointer; claim files are removed by
        vacuum along with their version directory."""
        try:
            fd = os.open(
                os.path.join(self.path, f"v={version}.claim"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
        except FileExistsError:
            raise ConcurrentWriteConflict(
                f"version {version} already claimed by another writer; "
                "re-read the table and retry"
            ) from None

    def _manifest_file(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}", _MANIFEST)

    def _manifest_raw(self, version: int) -> dict | None:
        try:
            with open(self._manifest_file(version)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _manifest(self, version: int) -> dict[int, int] | None:
        """bucket -> version whose ``v=<version>/bucket=<b>`` directory
        holds that bucket's current rows. Two on-disk forms: the legacy
        flat {bucket: version} map, and the current
        {"buckets": ..., "num_buckets": N} envelope (the envelope makes
        the bucket COUNT part of the atomically-committed version, so
        ``rebucket`` can change it under the same pointer-swap
        guarantee as any data commit)."""
        raw = self._manifest_raw(version)
        if raw is None:
            return None
        buckets = raw["buckets"] if "buckets" in raw else raw
        return {int(k): int(v) for k, v in buckets.items()}

    def _refresh_placement(self, version: int) -> None:
        """Adopt the bucket count the given version was committed with
        (envelope manifests only; legacy manifests keep the config
        value). Called before any operation that hashes keys to
        buckets, so a reader/writer that opened the table before a
        rebucket still routes correctly after it."""
        raw = self._manifest_raw(version)
        if raw is not None and "num_buckets" in raw:
            self.num_buckets = int(raw["num_buckets"])

    def _write_manifest(self, version: int, manifest: dict[int, int]) -> None:
        os.makedirs(os.path.join(self.path, f"v={version}"), exist_ok=True)
        with open(self._manifest_file(version), "w") as f:
            json.dump(
                {
                    "buckets": {str(k): v for k, v in sorted(manifest.items())},
                    "num_buckets": self.num_buckets,
                },
                f,
            )

    def _bucket_dir(self, bucket: int, version: int) -> str:
        return os.path.join(self.path, f"v={version}", f"{BUCKET_COL}={bucket}")

    def _bucket_expr(self):
        return F.pmod(
            F.hash(*[F.col(c) for c in self.bucket_cols]), F.lit(self.num_buckets)
        )

    def _vacuum(self, current: int) -> None:
        """Remove version directories older than the retention window
        UNLESS a retained manifest still references their bucket
        directories (a bucket untouched for many commits keeps its old
        version directory alive)."""
        floor = current - self.keep_versions
        referenced: set[int] = set()
        for v in range(max(floor, 0), current + 1):
            m = self._manifest(v)
            if m:
                referenced.update(m.values())
        for name in os.listdir(self.path):
            if not name.startswith("v=") or name.endswith(".claim"):
                continue
            v = int(name[2:])
            if v < floor and v not in referenced:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
        for name in os.listdir(self.path):
            if name.startswith("v=") and name.endswith(".claim"):
                v = int(name[2 : -len(".claim")])
                if v <= current and not os.path.isdir(
                    os.path.join(self.path, f"v={v}")
                ):
                    # committed-or-vacuumed epoch with no directory left
                    os.remove(os.path.join(self.path, name))

    def break_claim(self, version: int) -> None:
        """Manual recovery: release the claim of a writer that CRASHED
        after claiming ``version`` but before committing (its claim
        would otherwise block that version number forever, since no
        commit ever supersedes it). Operator action by design — the
        table cannot distinguish a crashed writer from a slow one;
        call only when the claiming process is known dead. The next
        writer then retries and wins the version."""
        try:
            os.remove(os.path.join(self.path, f"v={version}.claim"))
        except FileNotFoundError:
            pass

    # -- reads -------------------------------------------------------------

    def current(
        self,
        spark: SparkSession,
        version: int | None = None,
        include_tombstones: bool = False,
    ) -> DataFrame | None:
        """The table at its latest commit — or, with ``version``, a
        TIME-TRAVEL read of any still-retained older commit: each
        version directory keeps the full bucket->directory manifest it
        was committed with, so reading "as of v" is just resolving
        that manifest (the lakehouse snapshot-read idiom; retention =
        ``keep_versions`` + manifest references, enforced by vacuum).
        Deleted keys (tombstones) are filtered unless
        ``include_tombstones`` — raw reads keep the marker column."""
        v = self.latest_version() if version is None else version
        if v < 0:
            return None
        manifest = self._manifest(v) or {}
        paths = [self._bucket_dir(b, vb) for b, vb in sorted(manifest.items())]
        if not paths:
            return None
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        if TOMBSTONE_COL not in df.columns:
            return (
                df.withColumn(TOMBSTONE_COL, F.lit(False))
                if include_tombstones
                else df
            )
        if include_tombstones:
            return df
        return df.filter(~F.col(TOMBSTONE_COL)).drop(TOMBSTONE_COL)

    def lookup(self, spark: SparkSession, **key_values) -> DataFrame | None:
        """Point lookup by arbitrary column equalities. When every
        BUCKET column is given, only the ONE bucket directory those
        values hash to is read — O(bucket), not O(table)."""
        v = self.latest_version()
        if v < 0:
            return None
        manifest = self._manifest(v) or {}
        if not manifest:
            return None
        self._refresh_placement(v)
        if set(self.bucket_cols) <= set(key_values):
            # Spark's hash() is TYPE-SENSITIVE: hash(7012 AS INT) !=
            # hash(7012 AS BIGINT), and a bare F.lit(python_int) is an
            # INT while stored keys are typically BIGINT — the pruned
            # lookup would hash to the WRONG bucket and silently miss.
            # Cast each literal to the stored column's type. The
            # resolved types are CACHED on the instance keyed by the
            # commit version (ADVICE r09) — the footer read happens
            # once per version, not once per point lookup; a new
            # commit (schema could evolve) invalidates the cache.
            if (
                self._key_types_cache is not None
                and self._key_types_cache[0] == v
            ):
                types = self._key_types_cache[1]
            else:
                any_b = next(iter(manifest))
                stored = spark.read.parquet(
                    self._bucket_dir(any_b, manifest[any_b])
                ).schema
                types = {f.name: f.dataType for f in stored.fields}
                self._key_types_cache = (v, types)
            b = (
                spark.range(1)
                .select(
                    F.pmod(
                        F.hash(
                            *[
                                F.lit(key_values[c]).cast(types[c])
                                if c in types
                                else F.lit(key_values[c])
                                for c in self.bucket_cols
                            ]
                        ),
                        F.lit(self.num_buckets),
                    ).alias("b")
                )
                .first()["b"]
            )
            if b in manifest:
                cur = spark.read.parquet(self._bucket_dir(b, manifest[b]))
            else:
                # key's bucket has no data yet: empty result, right schema
                cur = self.current(spark).limit(0)
        else:
            cur = self.current(spark)
        if TOMBSTONE_COL in cur.columns:
            cur = cur.filter(~F.col(TOMBSTONE_COL)).drop(TOMBSTONE_COL)
        for k, val in key_values.items():
            cur = cur.filter(F.col(k) == F.lit(val))
        return cur

    def change_feed(
        self, spark: SparkSession, v_from: int, v_to: int | None = None
    ) -> DataFrame | None:
        """CDC between two retained commits: one row per key whose state
        differs between version ``v_from`` and ``v_to`` (default:
        latest), with ``change_type`` in insert/update/delete and the
        old/new sequence numbers. The lakehouse change-data-feed read,
        built from what the commit protocol already records.

        Cost is O(CHANGED buckets), not O(table): a bucket untouched
        between the two versions has the SAME directory in both
        manifests — provably identical bytes — so only buckets whose
        manifest entry moved are read and diffed (at production bucket
        counts this is the micro-batch footprint, a tiny fraction of
        state). Within changed buckets, per-key change detection is the
        ``seq_col`` contract: the merge keeps the max-seq row per key,
        so a key changed iff its surviving seq changed — no column-wise
        struct compare, and replayed (idempotent) upserts produce no
        feed rows. Returns None when neither version has data."""
        if v_to is None:
            v_to = self.latest_version()
        # v_from == -1 means "before the table existed" (everything in
        # v_to is an insert). A NON-negative v_from whose manifest is
        # gone is a different situation entirely — the version existed
        # but was vacuumed past keep_versions — and defaulting it to {}
        # would silently report the whole v_to state as inserts: wrong
        # CDC output with no error (ADVICE r03). Raise instead.
        if v_from >= 0:
            m_from = self._manifest(v_from)
            if m_from is None:
                raise ValueError(
                    f"change_feed: version {v_from} is outside retention "
                    f"(manifest vacuumed); cannot compute changes from it"
                )
        else:
            m_from = {}
        if v_to >= 0:
            m_to = self._manifest(v_to)
            if m_to is None:
                raise ValueError(
                    f"change_feed: version {v_to} has no manifest "
                    f"(outside retention or never committed)"
                )
        else:
            m_to = {}
        changed = sorted(
            b for b in set(m_from) | set(m_to) if m_from.get(b) != m_to.get(b)
        )
        old_paths = [self._bucket_dir(b, m_from[b]) for b in changed if b in m_from]
        new_paths = [self._bucket_dir(b, m_to[b]) for b in changed if b in m_to]
        if not old_paths and not new_paths:
            return None
        sides = []
        for paths, alias, ts_alias in (
            (old_paths, "old_seq", "_old_ts"),
            (new_paths, "new_seq", "_new_ts"),
        ):
            if paths:
                raw = spark.read.option("mergeSchema", "true").parquet(*paths)
                ts = (
                    F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
                    if TOMBSTONE_COL in raw.columns
                    else F.lit(False)
                )
                side = raw.select(
                    *self.key_cols,
                    F.col(self.seq_col).alias(alias),
                    ts.alias(ts_alias),
                )
            else:
                template = old_paths or new_paths
                side = (
                    spark.read.parquet(*template)
                    .select(
                        *self.key_cols,
                        F.col(self.seq_col).alias(alias),
                        F.lit(False).alias(ts_alias),
                    )
                    .limit(0)
                )
            sides.append(side)
        old, new = sides
        # tombstone-aware classification: a key's LIVENESS transition
        # decides insert/delete (absent-or-tombstoned -> live = insert,
        # live -> tombstoned-or-absent = delete); a seq change between
        # two live states is an update; dead -> dead (re-deleted or
        # replayed tombstone) is no event.
        old_live = F.col("old_seq").isNotNull() & ~F.col("_old_ts")
        new_live = F.col("new_seq").isNotNull() & ~F.col("_new_ts")
        return (
            old.join(new, self.key_cols, "full_outer")
            .withColumn(
                "change_type",
                F.when(~old_live & new_live, F.lit("insert"))
                .when(old_live & ~new_live, F.lit("delete"))
                .when(
                    old_live & new_live
                    & (F.col("new_seq") != F.col("old_seq")),
                    F.lit("update"),
                ),
            )
            .filter(F.col("change_type").isNotNull())
            .select(*self.key_cols, "change_type", "old_seq", "new_seq")
        )

    # -- writes ------------------------------------------------------------

    def upsert(self, batch_df: DataFrame) -> int:
        """Merge a micro-batch: per key keep the highest-``seq_col`` row
        (new beats old; replayed rows tie with themselves — idempotent).
        Reads and rewrites ONLY the buckets the micro-batch touches;
        untouched buckets keep their existing directories via the
        manifest. Writes version N+1, swaps the pointer, vacuums
        unreferenced versions. Returns the committed version number.

        The touched-bucket list is a ``distinct().collect()`` — bounded
        by ``num_buckets`` integers, never by table or batch size."""
        if BUCKET_COL in batch_df.columns:
            raise ValueError(
                f"column name {BUCKET_COL!r} is reserved by ServingTable"
            )
        spark = batch_df.sparkSession
        cur_v = self.latest_version()
        manifest = (self._manifest(cur_v) or {}) if cur_v >= 0 else {}
        if cur_v >= 0:
            self._refresh_placement(cur_v)
        if TOMBSTONE_COL not in batch_df.columns:
            batch_df = batch_df.withColumn(TOMBSTONE_COL, F.lit(False))
        batch = batch_df.withColumn(BUCKET_COL, self._bucket_expr())
        touched = sorted(
            r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()
        )
        cur_paths = [
            self._bucket_dir(b, manifest[b]) for b in touched if b in manifest
        ]
        if cur_paths:
            # bucket is a partition dir, dropped on leaf-dir read;
            # recompute it (deterministic hash of the key)
            cur = spark.read.option("mergeSchema", "true").parquet(
                *cur_paths
            ).withColumn(
                BUCKET_COL, self._bucket_expr()
            )
            if TOMBSTONE_COL not in cur.columns:  # pre-tombstone layout
                cur = cur.withColumn(TOMBSTONE_COL, F.lit(False))
            # allowMissingColumns: a delete batch carries only key+seq —
            # its absent value columns null-fill (nobody reads values of
            # a tombstoned row)
            merged = cur.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        w = W.partitionBy(*self.key_cols).orderBy(F.col(self.seq_col).desc())
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        next_v = cur_v + 1
        self._claim_version(next_v)
        (
            latest.repartition(max(len(touched), 1), F.col(BUCKET_COL))
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(os.path.join(self.path, f"v={next_v}"))
        )
        new_manifest = {**manifest, **{int(b): next_v for b in touched}}
        self._write_manifest(next_v, new_manifest)
        self._save_config()
        self._commit(next_v)
        self._vacuum(next_v)
        return next_v

    def delete(self, keys_df: DataFrame) -> int:
        """Row-level delete as a TOMBSTONE upsert: ``keys_df`` carries
        the key columns (bucket columns too, if different) and a
        ``seq_col`` value that must beat the row's current seq — the
        same max-seq merge as any write, so replayed deletes are
        idempotent and a later higher-seq upsert revives the key.
        Absent value columns null-fill (nobody reads values of a
        tombstoned row). The read surface (current/lookup) stops
        serving the key; the change feed emits a ``delete`` row for
        the liveness transition; time travel with
        ``include_tombstones`` still shows the marker. Tombstones cost
        one key-sized row per deleted key until a compaction pass
        drops those older than every retained version — the lakehouse
        MERGE ... WHEN MATCHED THEN DELETE, at this table's scale."""
        return self.upsert(keys_df.withColumn(TOMBSTONE_COL, F.lit(True)))

    def purge_tombstones(self, spark: SparkSession, min_seq) -> int:
        """Physically drop tombstones with ``seq < min_seq`` — the
        reclamation pass that keeps delete markers from accumulating
        forever. The floor is the CALLER'S replay guarantee: purge
        only below the sequence no replay can ever carry again (for a
        checkpointed drain, the committed offset's seq; in lakehouse
        terms, the retention window). Purging above that line would
        let a stale replayed upsert resurrect the key the tombstone
        was holding down.

        Rewrites ONLY buckets that actually hold purgeable tombstones
        (same touched-bucket discipline as upsert); a bucket left
        empty by the purge drops out of the manifest entirely.
        Returns the committed version (unchanged if nothing purged)."""
        cur_v = self.latest_version()
        if cur_v < 0:
            return cur_v
        self._refresh_placement(cur_v)
        manifest = self._manifest(cur_v) or {}
        paths = [self._bucket_dir(b, vb) for b, vb in sorted(manifest.items())]
        if not paths:
            return cur_v
        raw = (
            spark.read.option("mergeSchema", "true")
            .parquet(*paths)
            .withColumn(BUCKET_COL, self._bucket_expr())
        )
        if TOMBSTONE_COL not in raw.columns:
            return cur_v
        dead = F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)) & (
            F.col(self.seq_col) < F.lit(min_seq)
        )
        touched = sorted(
            r[BUCKET_COL]
            for r in raw.filter(dead).select(BUCKET_COL).distinct().collect()
        )
        if not touched:
            return cur_v
        keep = raw.filter(F.col(BUCKET_COL).isin([int(b) for b in touched])).filter(
            ~dead
        )
        next_v = cur_v + 1
        self._claim_version(next_v)
        (
            keep.repartition(max(len(touched), 1), F.col(BUCKET_COL))
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(os.path.join(self.path, f"v={next_v}"))
        )
        written = {
            int(r[BUCKET_COL])
            for r in keep.select(BUCKET_COL).distinct().collect()
        }
        new_manifest = {
            b: v for b, v in manifest.items() if b not in set(touched)
        }
        new_manifest.update({b: next_v for b in written})
        self._write_manifest(next_v, new_manifest)
        self._commit(next_v)
        self._vacuum(next_v)
        return next_v

    def rebucket(self, spark: SparkSession, new_num_buckets: int) -> int:
        """Change the table's bucket count — the maintenance escape
        hatch when state outgrows the original layout (a bucket should
        stay ~hundreds of MB; state that grew 100x needs 100x the
        buckets for upserts and point lookups to stay O(bucket)).

        One deliberate O(table) rewrite: every row re-hashes into the
        new bucket space under version N+1, whose manifest records the
        NEW count — the bucket count rides the same atomic pointer swap
        as the data, so a crash anywhere mid-rebucket leaves the old
        count and old directories live, and a reader that opened the
        table before the rebucket re-adopts the committed count on its
        next operation (``_refresh_placement``). The pinned config file
        is refreshed after the commit purely as the cold-open default;
        correctness never depends on it once an envelope manifest
        exists."""
        if new_num_buckets < 1:
            raise ValueError("new_num_buckets must be >= 1")
        cur_v = self.latest_version()
        # raw read: tombstones MUST survive a rebucket (dropping one
        # would let a replayed lower-seq upsert revive the deleted key)
        cur = self.current(spark, include_tombstones=True)
        if cur is None:
            self.num_buckets = new_num_buckets
            return cur_v
        self.num_buckets = new_num_buckets
        next_v = cur_v + 1
        self._claim_version(next_v)
        rehashed = cur.withColumn(BUCKET_COL, self._bucket_expr())
        touched = sorted(
            r[BUCKET_COL] for r in rehashed.select(BUCKET_COL).distinct().collect()
        )
        (
            rehashed.repartition(max(len(touched), 1), F.col(BUCKET_COL))
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(os.path.join(self.path, f"v={next_v}"))
        )
        # fresh manifest: every live bucket lives in the new version;
        # nothing references older directories
        self._write_manifest(next_v, {int(b): next_v for b in touched})
        self._commit(next_v)
        atomic_write_text(
            os.path.join(self.path, _CONFIG),
            json.dumps(
                {
                    "key_cols": self.key_cols,
                    "seq_col": self.seq_col,
                    "num_buckets": self.num_buckets,
                    "bucket_cols": self.bucket_cols,
                }
            ),
        )
        self._vacuum(next_v)
        return next_v


def attach_serving_sink(
    drain: DataFrame,
    table: ServingTable,
    checkpoint: str,
    processing_time: str | None = None,
):
    """Run a drain stream into the serving table: one idempotent upsert
    per micro-batch, checkpointed so a restart resumes from the last
    committed batch. Empty micro-batches (triggers that drained
    nothing) commit no new version. Default trigger is ``availableNow``
    (finite drain — the deterministic test form); pass
    ``processing_time`` for the long-running clock-paced form (the HTTP
    listener's live drain, where the interval IS the rate limit)."""

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        if not batch_df.isEmpty():
            # optimistic-concurrency retry: another writer (e.g. the
            # HTTP listener's synchronous registration) may win the
            # version race; the upsert's max-seq merge is idempotent,
            # so re-running it against the new state is always safe
            while True:
                try:
                    table.upsert(batch_df)
                    return
                except ConcurrentWriteConflict:
                    time.sleep(0.05)

    w = (
        drain.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_sink)
    )
    if processing_time is None:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime=processing_time)
    return w.start()
