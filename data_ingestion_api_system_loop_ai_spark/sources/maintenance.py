"""Table maintenance: small-file compaction and sort-for-skipping.

A continuously-ingesting pipeline (the reference accepts requests one
POST at a time; the streaming layer lands one micro-batch of files per
trigger) accumulates many small files — the classic lakehouse failure
mode at 100 TB: every query pays per-file open/footer costs and the
scheduler drowns in splits. These helpers are the batch maintenance
pass a production deployment runs behind the live writer:

- ``compact_parquet``: bin-packs a parquet dataset (optionally
  per hive partition) into files of ``target_file_bytes``, sized from
  the ACTUAL on-disk bytes, not row counts — compression-aware.
- ``rewrite_sorted``: rewrites with an intra-partition sort so parquet
  writes tight min/max column statistics; point/range predicates on the
  sort key then skip whole row groups at scan time (the single-column
  cousin of Z-ordering).

Both are plain batch jobs over open formats — no table-format service
required; the same calls run against a partitioned directory on object
storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dataset_bytes(path: str) -> int:
    # local-filesystem listing; an object-store deployment swaps this one
    # function for the Hadoop FileSystem API (listFiles is the only
    # size source needed — the planning logic above it is unchanged)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_target_files(path: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES) -> int:
    """Number of output files that bin-packs the dataset's on-disk bytes
    into ``target_file_bytes`` chunks (>= 1). Driven by real file sizes
    so compressed column data, not row counts, decides the layout."""
    return max(1, -(-_dataset_bytes(path) // target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: str | None = None,
) -> int:
    """Rewrite ``src`` (a parquet dataset, possibly thousands of small
    files) into ``dst`` with file count chosen from on-disk size.
    Returns the target file count.

    Unpartitioned: one ``repartition(n)`` — a full shuffle, but the
    maintenance job is the one place that shuffle is the *point* (it is
    what redistributes many tiny files into even large ones).
    Partitioned: ``repartition(n, partition_col)`` + ``partitionBy``
    keeps each hive partition's rows together so the rewrite preserves
    partition pruning; files per partition stay bounded by n.
    """
    df = spark.read.parquet(src)
    n = plan_target_files(src, target_file_bytes)
    if partition_by:
        (
            df.repartition(n, F.col(partition_by))
            .write.partitionBy(partition_by)
            .mode("overwrite")
            .parquet(dst)
        )
    else:
        df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def rewrite_sorted(
    spark: SparkSession,
    src: str,
    dst: str,
    sort_cols: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Compact AND cluster: range-partition by the sort key(s) then sort
    within each output file, so parquet min/max statistics on the sort
    columns are tight and disjoint across files — a scan with a
    predicate on the leading sort column reads only the files (and row
    groups) whose range overlaps. Returns the file count."""
    df = spark.read.parquet(src)
    n = plan_target_files(src, target_file_bytes)
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(dst)
    )
    return n


ZORDER_BITS = 16  # bits per normalized dimension; 3 cols fit a long


def zorder_key(cols: list[str], bits: int = ZORDER_BITS) -> "F.Column":
    """Morton (Z-order) key over NORMALIZED dimensions ``_zn0.._znd``:
    interleave ``bits`` bits of each, so rows close in the key are close
    in EVERY dimension. Pure codegen bit math, no UDF."""
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("interleaved width must fit a signed long")
    d = len(cols)
    key = None
    for j, c in enumerate(cols):
        v = F.col(c).cast("long")
        for b in range(bits):
            term = F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)), b * d + j)
            key = term if key is None else key + term
    return key


def rewrite_zorder(
    spark: SparkSession,
    src: str,
    dst: str,
    cols: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Compact AND multi-dimensionally cluster: range-partition + sort by
    a Morton key of ``cols``, so per-file min/max footer ranges shrink
    ~n^(1/d) in EVERY listed column — predicates on ANY of them skip
    files/row groups, not just a leading sort column.

    Dimensions are first NORMALIZED to a common ``ZORDER_BITS`` width by
    min/max linear scaling (one tiny broadcast stats pass): interleaving
    raw values whose ranges differ by orders of magnitude degenerates to
    a plain sort on the widest column, because its high bits dominate
    the key. (Heavily skewed columns would want rank bucketing instead
    of linear scaling; linear matches the uniform-ish test tables.)
    Returns the file count."""
    df = spark.read.parquet(src)
    n = plan_target_files(src, target_file_bytes)
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_mn{j}") for j, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"_mx{j}") for j, c in enumerate(cols)],
    )
    top = (1 << ZORDER_BITS) - 1
    normed = df.crossJoin(F.broadcast(stats))
    zn_cols = []
    for j, c in enumerate(cols):
        span = F.greatest(F.col(f"_mx{j}") - F.col(f"_mn{j}"), F.lit(1))
        zn = ((F.col(c).cast("long") - F.col(f"_mn{j}")) * top / span).cast("long")
        zn_cols.append(zn.alias(f"_zn{j}"))
    normed = normed.select(*df.columns, *zn_cols)
    key = zorder_key([f"_zn{j}" for j in range(len(cols))]).alias("_zkey")
    (
        normed.withColumn("_zkey", key)
        .repartitionByRange(n, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_zn{j}" for j in range(len(cols))])
        .write.mode("overwrite")
        .parquet(dst)
    )
    return n


def parquet_files(path: str) -> list[str]:
    """Data files of a parquet dataset (recursive, metadata excluded).
    Hidden directories (``_``/``.`` prefixed — ``_stats``, ``_SUCCESS``
    sidecars, checkpoint dirs) are pruned exactly as Hadoop's default
    PathFilter does, so metadata stored inside the dataset root is
    invisible to both this listing and Spark's own scan."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def footer_stats(path: str, cols: list[str], files: list[str] | None = None) -> list[dict]:
    """Per-file min/max for ``cols`` read from parquet FOOTERS — no data
    scan, O(files) metadata reads. This is the statistics source a
    skipping scan actually consults; ``file_column_ranges`` below
    recomputes the same numbers BY scanning and exists to cross-check
    this function in tests.

    Driver-side loop over the file listing: the maintenance-time scale
    path is an INCREMENTAL stats table (append one row per file as the
    writer lands it — what lakehouse manifests store); rebuilding from
    footers is the recovery/bootstrap path, and at 100 TB it would be
    distributed over the file list, not looped here."""
    import pyarrow.parquet as pq

    rows: list[dict] = []
    for f in (parquet_files(path) if files is None else files):
        md = pq.ParquetFile(f).metadata
        names = md.schema.names
        entry: dict = {"file": f, "rows": md.num_rows}
        for c in cols:
            j = names.index(c)
            mins, maxs = [], []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(j).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            entry[f"{c}_min"] = min(mins) if mins else None
            entry[f"{c}_max"] = max(maxs) if maxs else None
        rows.append(entry)
    return rows


def prune_files(
    path: str, col: str, lo=None, hi=None
) -> tuple[list[str], int]:
    """Files whose footer [min, max] range on ``col`` overlaps
    [lo, hi] (None = unbounded; files without stats are kept — skipping
    must never be lossy). Returns (selected files, total files)."""
    stats = footer_stats(path, [col])
    selected = []
    for s in stats:
        mn, mx = s[f"{col}_min"], s[f"{col}_max"]
        if mn is None or mx is None:
            selected.append(s["file"])
            continue
        if (lo is None or mx >= lo) and (hi is None or mn <= hi):
            selected.append(s["file"])
    return selected, len(stats)


def read_pruned(
    spark: SparkSession, path: str, col: str, lo=None, hi=None
) -> DataFrame:
    """Range scan with FILE-LEVEL skipping done before Spark plans: the
    file list shrinks to the overlapping files (footer stats), then the
    residual predicate still applies row-exactly — identical results to
    a full scan + filter, minus the opens/footers/row-groups of files
    that provably contain no match. The residual filter also pushes
    down, so parquet row-group pruning stacks on top of the file-level
    skip (clustered layouts from ``rewrite_sorted``/``rewrite_zorder``
    make both levels selective)."""
    files, _total = prune_files(path, col, lo, hi)
    if not files:
        return spark.read.parquet(path).filter(F.lit(False))
    # basePath keeps hive partition columns in the result when reading
    # an explicit (pruned) file list — without it a partitioned dataset
    # would lose its partition columns, breaking the identical-results
    # guarantee (ADVICE r03)
    df = spark.read.option("basePath", path).parquet(*files)
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df


def file_column_ranges(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Per-file min/max of ``col`` — the footer statistics a skipping
    scan consults, recomputed as a DataFrame for tests/inspection."""
    return (
        spark.read.parquet(path)
        .select(F.col(col), F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.min(col).alias("min_v"), F.max(col).alias("max_v"))
    )


# ---------------------------------------------------------------------------
# Incremental stats table — the production form of footer pruning.
#
# ``footer_stats`` re-opens every footer on every call: O(files) metadata
# round-trips per QUERY, which at 100 TB (millions of files on object
# storage) is exactly the cost file skipping exists to avoid. The fix is
# what lakehouse manifests store: a tiny PERSISTED table of one row per
# data file {file, rows, per-column min/max}, maintained incrementally —
# each update reads footers ONLY for files it has not seen before (the
# writer's just-landed output), and pruning becomes one small local read
# instead of a footer sweep. The table lives under ``<dataset>/_stats``,
# hidden from both Spark's scan and ``parquet_files`` by the Hadoop
# hidden-path convention. Skipping stays LOSSLESS by construction: data
# files not (yet) covered by the table are always kept.
# ---------------------------------------------------------------------------

STATS_DIR = "_stats"
STATS_FILE = "stats.parquet"


def _stats_path(path: str, stats_dir: str | None = None) -> str:
    return os.path.join(stats_dir or os.path.join(path, STATS_DIR), STATS_FILE)


def load_stats_table(path: str, stats_dir: str | None = None) -> list[dict] | None:
    """Rows of the persisted stats table ({file, rows, <col>_min/_max}),
    or None if it has never been built. Paths are dataset-relative."""
    import pyarrow.parquet as pq

    p = _stats_path(path, stats_dir)
    if not os.path.exists(p):
        return None
    return pq.read_table(p).to_pylist()


def update_stats_table(
    path: str, cols: list[str], stats_dir: str | None = None
) -> dict:
    """Build or incrementally refresh the stats table for ``cols``.

    Footers are read ONLY for files absent from the existing table (or
    for all files when the tracked column set changes — a schema change
    of the table itself); rows for vanished files (compaction/rewrite
    output replaced them) are dropped. The rewrite of the table file is
    atomic (temp + rename), so a concurrent reader sees the old or the
    new table, never a torn one. Returns {"added", "removed", "reused",
    "total"} so maintenance jobs can log their work.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    current = parquet_files(path)
    rel = {os.path.relpath(f, path): f for f in current}
    existing = load_stats_table(path, stats_dir)
    wanted_keys = {"file", "rows"} | {
        f"{c}_{m}" for c in cols for m in ("min", "max")
    }
    by_file: dict[str, dict] = {}
    if existing is not None and all(
        wanted_keys <= set(r) for r in existing
    ):
        by_file = {r["file"]: r for r in existing if r["file"] in rel}
    reused = len(by_file)
    removed = 0 if existing is None else len(existing) - reused
    new_files = [rel[k] for k in sorted(rel) if k not in by_file]
    for r in footer_stats(path, cols, files=new_files):
        r["file"] = os.path.relpath(r["file"], path)
        by_file[r["file"]] = {k: r[k] for k in r}
    rows = [by_file[k] for k in sorted(by_file)]
    p = _stats_path(path, stats_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    cols_order = ["file", "rows"] + [
        f"{c}_{m}" for c in cols for m in ("min", "max")
    ]
    table = pa.Table.from_pylist([{k: r.get(k) for k in cols_order} for r in rows])
    pq.write_table(table, tmp)
    os.replace(tmp, p)
    return {
        "added": len(new_files),
        "removed": removed,
        "reused": reused,
        "total": len(rows),
    }


def prune_files_stats(
    path: str, col: str, lo=None, hi=None, stats_dir: str | None = None
) -> tuple[list[str], int]:
    """File-level skip from the PERSISTED stats table — no footer reads
    at query time. Files missing from the table (landed after the last
    ``update_stats_table``) or with absent min/max are kept: skipping is
    never lossy. Falls back to the footer sweep if the table was never
    built. Returns (selected absolute paths, total files)."""
    stats = load_stats_table(path, stats_dir)
    current = parquet_files(path)
    if stats is None:
        return prune_files(path, col, lo, hi)
    by_file = {r["file"]: r for r in stats}
    selected = []
    for f in current:
        r = by_file.get(os.path.relpath(f, path))
        if r is None:
            selected.append(f)
            continue
        mn, mx = r.get(f"{col}_min"), r.get(f"{col}_max")
        if mn is None or mx is None:
            selected.append(f)
            continue
        if (lo is None or mx >= lo) and (hi is None or mn <= hi):
            selected.append(f)
    return selected, len(current)


def read_pruned_stats(
    spark: SparkSession, path: str, col: str, lo=None, hi=None,
    stats_dir: str | None = None,
) -> DataFrame:
    """``read_pruned`` driven by the persisted stats table: same exact
    results as a full scan + filter (the residual predicate still
    applies row-exactly and still pushes down), but query planning costs
    one small local read instead of O(files) footer opens."""
    files, _total = prune_files_stats(path, col, lo, hi, stats_dir)
    if not files:
        return spark.read.parquet(path).filter(F.lit(False))
    # basePath restores hive partition columns on the explicit file
    # list (ADVICE r03; see read_pruned)
    df = spark.read.option("basePath", path).parquet(*files)
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df
