"""Maintenance passes: compaction must preserve data exactly while
bounding file counts; sorted rewrite must leave disjoint per-file key
ranges (the property row-group/file skipping depends on)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table
from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
    compact_parquet,
    file_column_ranges,
    parquet_files,
    rewrite_sorted,
)


def _fragmented_events(spark, sf_dir, path, n_files=64):
    load_table(spark, sf_dir, "events").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_compaction_bounds_files_and_preserves_rows(spark, sf_dir, tmp_path):
    src = _fragmented_events(spark, sf_dir, str(tmp_path / "frag"))
    assert len(parquet_files(src)) == 64
    dst = str(tmp_path / "compact")
    # small target -> a handful of files, deterministic from on-disk bytes
    n = compact_parquet(spark, src, dst, target_file_bytes=1 * 1024 * 1024)
    got = parquet_files(dst)
    assert 1 <= len(got) <= max(n, 1) and len(got) < 64
    before = Counter(map(str, spark.read.parquet(src).collect()))
    after = Counter(map(str, spark.read.parquet(dst).collect()))
    assert before == after


def test_partitioned_compaction_preserves_pruning(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag_p")
    load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    ).repartition(32).write.partitionBy("event_date").mode("overwrite").parquet(src)
    dst = str(tmp_path / "compact_p")
    compact_parquet(
        spark, src, dst, target_file_bytes=4 * 1024 * 1024, partition_by="event_date"
    )
    one_day = spark.read.parquet(dst).filter(
        F.col("event_date") == F.lit("2024-01-02")
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at listing time, not post-scan
    assert "PartitionFilters: [" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert one_day.count() == spark.read.parquet(src).filter(
        F.col("event_date") == F.lit("2024-01-02")
    ).count()


def test_zorder_rewrite_clusters_every_dimension(spark, sf_dir, tmp_path):
    """Z-order (normalized Morton key) must shrink per-file min/max
    ranges in BOTH listed columns — a plain sort clusters only its
    leading column and leaves the other at full span per file."""
    from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
        rewrite_zorder,
    )

    src = _fragmented_events(spark, sf_dir, str(tmp_path / "frag_z"))
    dst = str(tmp_path / "zorder")
    rewrite_zorder(
        spark, src, dst, ["event_id", "user_id"], target_file_bytes=16 * 1024
    )

    full = spark.read.parquet(src)
    for col in ("event_id", "user_id"):
        lo, hi = full.agg(F.min(col), F.max(col)).first()
        global_span = hi - lo
        rows = file_column_ranges(spark, dst, col).collect()
        assert len(rows) >= 4
        avg_span = sum(r["max_v"] - r["min_v"] for r in rows) / len(rows)
        assert avg_span < 0.6 * global_span, col

    before = Counter(map(str, spark.read.parquet(src).collect()))
    after = Counter(map(str, spark.read.parquet(dst).collect()))
    assert before == after


def test_sorted_rewrite_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    src = _fragmented_events(spark, sf_dir, str(tmp_path / "frag_s"))
    dst = str(tmp_path / "sorted")
    n = rewrite_sorted(
        spark, src, dst, ["event_id"], target_file_bytes=1 * 1024 * 1024
    )
    ranges = file_column_ranges(spark, dst, "event_id").orderBy("min_v").collect()
    assert len(ranges) >= 2 or n == 1
    # fragmented layout: every file spans ~the whole key domain; sorted
    # layout: ranges are pairwise disjoint, so a point/range predicate
    # overlaps few files
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["max_v"] < cur["min_v"]
    before = Counter(map(str, spark.read.parquet(src).collect()))
    after = Counter(map(str, spark.read.parquet(dst).collect()))
    assert before == after


def test_footer_stats_prune_and_read(spark, sf_dir, tmp_path):
    """Footer-derived min/max agrees with a scan-computed check; a range
    read prunes the file list before Spark plans the scan and still
    returns exactly the full-scan-filter result."""
    from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
        footer_stats,
        prune_files,
        read_pruned,
    )

    src = _fragmented_events(spark, sf_dir, str(tmp_path / "frag_fs"))
    dst = str(tmp_path / "sorted_fs")
    rewrite_sorted(spark, src, dst, ["event_id"], target_file_bytes=32 * 1024)

    stats = {s["file"]: s for s in footer_stats(dst, ["event_id"])}
    scanned = {
        r["file"].replace("file://", ""): r
        for r in file_column_ranges(spark, dst, "event_id").collect()
    }
    assert len(stats) == len(scanned) >= 2
    for f, s in stats.items():
        assert (s["event_id_min"], s["event_id_max"]) == (
            scanned[f]["min_v"], scanned[f]["max_v"],
        )

    full = spark.read.parquet(dst)
    lo = full.agg(F.expr("percentile(event_id, 0.4)")).first()[0]
    hi = full.agg(F.expr("percentile(event_id, 0.6)")).first()[0]
    lo, hi = int(lo), int(hi)
    selected, total = prune_files(dst, "event_id", lo, hi)
    assert 0 < len(selected) < total  # skipping actually skipped files
    got = Counter(
        map(str, read_pruned(spark, dst, "event_id", lo, hi).collect())
    )
    want = Counter(
        map(
            str,
            full.filter((F.col("event_id") >= lo) & (F.col("event_id") <= hi))
            .collect(),
        )
    )
    assert got == want and len(want) > 0


def test_read_pruned_keeps_partition_columns(spark, sf_dir, tmp_path):
    """ADVICE r03: on a hive-partitioned dataset the pruned read must
    keep the partition columns (basePath), so results stay identical to
    full scan + filter — including the partition column itself."""
    from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
        read_pruned,
        read_pruned_stats,
        update_stats_table,
    )
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    dst = str(tmp_path / "part_ev")
    (
        load_table(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .repartition(4)
        .write.partitionBy("day")
        .parquet(dst)
    )
    full = spark.read.parquet(dst)
    lo = int(full.agg(F.expr("percentile(event_id, 0.45)")).first()[0])
    hi = int(full.agg(F.expr("percentile(event_id, 0.55)")).first()[0])
    want = Counter(
        map(
            str,
            full.filter((F.col("event_id") >= lo) & (F.col("event_id") <= hi))
            .select("event_id", "day")
            .collect(),
        )
    )
    got = read_pruned(spark, dst, "event_id", lo, hi)
    assert "day" in got.columns
    assert Counter(map(str, got.select("event_id", "day").collect())) == want
    update_stats_table(dst, ["event_id"])
    got2 = read_pruned_stats(spark, dst, "event_id", lo, hi)
    assert "day" in got2.columns
    assert Counter(map(str, got2.select("event_id", "day").collect())) == want


def test_stats_table_prunes_like_footers(spark, sf_dir, tmp_path):
    """The persisted stats table must select exactly the same file set
    as a fresh footer sweep, and the pruned read must equal the full
    scan + filter row-for-row."""
    from collections import Counter

    from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
        prune_files,
        prune_files_stats,
        read_pruned_stats,
        rewrite_sorted,
        update_stats_table,
    )

    src = _fragmented_events(spark, sf_dir, str(tmp_path / "frag_st"))
    dst = str(tmp_path / "sorted_st")
    rewrite_sorted(spark, src, dst, ["event_id"], target_file_bytes=64 * 1024)
    summary = update_stats_table(dst, ["event_id"])
    assert summary["added"] == summary["total"] > 1 and summary["reused"] == 0

    lo, hi = 100, 150
    via_table, total_t = prune_files_stats(dst, "event_id", lo, hi)
    via_footers, total_f = prune_files(dst, "event_id", lo, hi)
    assert via_table == via_footers and total_t == total_f
    assert 0 < len(via_table) < total_t  # the skip actually skips

    got = Counter(map(str, read_pruned_stats(spark, dst, "event_id", lo, hi).collect()))
    want = Counter(
        map(
            str,
            spark.read.parquet(dst)
            .filter((F.col("event_id") >= lo) & (F.col("event_id") <= hi))
            .collect(),
        )
    )
    assert got == want


def test_stats_table_update_is_incremental_and_lossless(spark, sf_dir, tmp_path):
    """New files: (a) are KEPT by pruning before the table is refreshed
    (skipping never lossy), (b) cost exactly one footer read each on
    refresh while old rows are reused, and (c) vanished files drop out."""
    import os

    from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
        parquet_files,
        prune_files_stats,
        update_stats_table,
    )

    dst = str(tmp_path / "inc")
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    ev.repartition(4).write.mode("overwrite").parquet(dst)
    s1 = update_stats_table(dst, ["event_id"])
    assert s1["added"] == 4 and s1["reused"] == 0

    # land new files OUT OF RANGE of the probe; do not refresh the table
    late = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") >= 5000) & (F.col("event_id") < 6000)
    )
    late.coalesce(1).write.mode("append").parquet(dst)
    n_files = len(parquet_files(dst))
    assert n_files == 5
    sel, total = prune_files_stats(dst, "event_id", 5500, 5600)
    assert total == 5
    # the uncovered new file MUST be kept even though covered files skip
    covered_kept = [f for f in sel if f in set(parquet_files(dst))]
    assert len(covered_kept) >= 1 and len(sel) < total + 1

    s2 = update_stats_table(dst, ["event_id"])
    assert s2["added"] == 1 and s2["reused"] == 4 and s2["total"] == 5
    sel2, _ = prune_files_stats(dst, "event_id", 5500, 5600)
    assert len(sel2) == 1  # now only the genuinely-overlapping file stays

    # compaction replaces files; refresh drops the vanished rows
    for f in parquet_files(dst)[:2]:
        os.remove(f)
    s3 = update_stats_table(dst, ["event_id"])
    assert s3["removed"] == 2 and s3["total"] == 3


# ---------------------------------------------------------------------------
# Incremental aggregate rollup (sources/rollup.py)
# ---------------------------------------------------------------------------


def _rollup_fixture(spark, sf_dir, tmp_path, n_files=3):
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    p = str(tmp_path / "li_ds")
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(p)
    )
    return p


def _full_recompute(spark, path):
    from pyspark.sql import functions as F

    return {
        r["l_returnflag"]: (r["cnt"], r["sum_m"], r["min_m"], r["max_m"])
        for r in spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_m"),
            F.min("l_quantity").alias("min_m"),
            F.max("l_quantity").alias("max_m"),
        )
        .collect()
    }


def _finalized(df):
    return {
        r["l_returnflag"]: (r["cnt"], r["sum_m"], r["min_m"], r["max_m"])
        for r in df.collect()
    }


def test_rollup_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    """Build, append twice, refresh each time: the finalized rollup is
    BIT-IDENTICAL to a full groupBy recompute (decimal partial sums
    merge losslessly), and each refresh covers only newly-landed
    files."""
    import shutil

    from data_ingestion_api_system_loop_ai_spark.sources import rollup as ru

    p = _rollup_fixture(spark, sf_dir, tmp_path)
    r1 = ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    assert r1["new_files"] > 0 and r1["units"] == 1
    assert _finalized(ru.read_rollup(spark, p, "by_flag")) == _full_recompute(
        spark, p
    )

    # no-op refresh commits nothing
    r2 = ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    assert r2 == {"new_files": 0, "unit": None, "units": 1}

    # append a new file; PROVE the refresh reads only it by making every
    # previously-covered file unreadable first
    extra = str(tmp_path / "extra")
    spark.read.parquet(p).limit(500).coalesce(1).write.parquet(extra)
    import glob, os

    src = glob.glob(extra + "/*.parquet")[0]
    expected_after = None
    covered = [
        os.path.join(p, f)
        for u in ru.load_rollup_manifest(p, "by_flag")["units"]
        for f in u["files"]
    ]
    shutil.copy(src, os.path.join(p, "late-0001.parquet"))
    expected_after = _full_recompute(spark, p)
    backups = {}
    for f in covered:
        backups[f] = f + ".bak"
        os.rename(f, backups[f])
        with open(f, "wb") as fh:
            fh.write(b"not a parquet file")
    try:
        r3 = ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
        assert r3["new_files"] == 1 and r3["units"] == 2
    finally:
        for f, b in backups.items():
            os.replace(b, f)
    assert (
        _finalized(ru.read_rollup(spark, p, "by_flag")) == expected_after
    )


def test_rollup_current_covers_uncovered_tail(spark, sf_dir, tmp_path):
    """read_rollup_current = committed partials + live partial over
    files that landed after the last refresh — exact vs full
    recompute; read_rollup alone still reflects only covered files."""
    import glob, os, shutil

    from data_ingestion_api_system_loop_ai_spark.sources import rollup as ru

    p = _rollup_fixture(spark, sf_dir, tmp_path)
    ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    before = _full_recompute(spark, p)

    extra = str(tmp_path / "extra2")
    spark.read.parquet(p).limit(700).coalesce(1).write.parquet(extra)
    shutil.copy(
        glob.glob(extra + "/*.parquet")[0], os.path.join(p, "late-0002.parquet")
    )
    assert _finalized(ru.read_rollup(spark, p, "by_flag")) == before
    assert _finalized(
        ru.read_rollup_current(spark, p, "by_flag")
    ) == _full_recompute(spark, p)


def test_rollup_orphan_unit_invisible_and_compact(spark, sf_dir, tmp_path):
    """A unit directory written without a manifest commit (crash
    simulation) is never read; compaction folds units into one with
    identical finalized results."""
    import os

    from data_ingestion_api_system_loop_ai_spark.sources import rollup as ru

    p = _rollup_fixture(spark, sf_dir, tmp_path)
    ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    want = _finalized(ru.read_rollup(spark, p, "by_flag"))

    # orphan: partials written, manifest never committed
    orphan = os.path.join(p, "_rollup", "by_flag", "partials", "u_orphan")
    spark.read.parquet(
        os.path.join(p, "_rollup", "by_flag", "partials", "u000000")
    ).write.parquet(orphan)
    assert _finalized(ru.read_rollup(spark, p, "by_flag")) == want

    # second unit then compact
    import glob, shutil

    extra = str(tmp_path / "extra3")
    spark.read.parquet(p).limit(300).coalesce(1).write.parquet(extra)
    shutil.copy(
        glob.glob(extra + "/*.parquet")[0], os.path.join(p, "late-0003.parquet")
    )
    ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    full = _finalized(ru.read_rollup(spark, p, "by_flag"))
    st = ru.compact_rollup(spark, p, "by_flag")
    # the orphan never counts: 2 committed units, not 3
    assert st == {"units_before": 2, "units_after": 1}
    assert _finalized(ru.read_rollup(spark, p, "by_flag")) == full

    # key mismatch is an error, not silent divergence
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_orderkey")


def test_rollup_stream_writer_exactly_once(spark, sf_dir, tmp_path):
    """Streaming rollup maintenance: three single-file triggers through
    foreachBatch produce a rollup bit-identical to a batch recompute of
    everything delivered; replaying a committed batch (same batch_id)
    is a no-op, and a crash-before-commit replay (orphan partials, no
    manifest entry) converges to the same state."""
    import os

    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.sources import rollup as ru
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    src = str(tmp_path / "stream_src")
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(src)
    )
    tbl = str(tmp_path / "stream_rollup")
    os.makedirs(tbl)
    writer = ru.rollup_stream_writer(
        spark, tbl, "by_flag", ["l_returnflag"], "l_quantity"
    )
    q = (
        spark.readStream.schema("l_returnflag string, l_quantity double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    manifest = ru.load_rollup_manifest(tbl, "by_flag")
    assert len(manifest["units"]) == 3

    def _fin(df):
        return {
            r["l_returnflag"]: (r["cnt"], r["sum_m"], r["min_m"], r["max_m"])
            for r in df.collect()
        }

    want = _fin(
        spark.read.parquet(src)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_m"),
            F.min("l_quantity").alias("min_m"),
            F.max("l_quantity").alias("max_m"),
        )
    )
    assert _fin(ru.read_rollup(spark, tbl, "by_flag")) == want

    # replay arm (a): batch already committed -> no-op
    writer(spark.read.parquet(src), 0)
    assert len(ru.load_rollup_manifest(tbl, "by_flag")["units"]) == 3
    assert _fin(ru.read_rollup(spark, tbl, "by_flag")) == want

    # replay arm (b): crash before commit — drop the manifest entry for
    # the last unit (its partial directory remains as an orphan), then
    # replay that batch_id; the writer overwrites the orphan and commits
    import glob

    manifest = ru.load_rollup_manifest(tbl, "by_flag")
    dropped = manifest["units"].pop()
    ru._commit_manifest(tbl, "by_flag", manifest)
    a_file = sorted(glob.glob(src + "/*.parquet"))[0]
    writer(spark.read.parquet(a_file), dropped["batch_id"])
    after = ru.load_rollup_manifest(tbl, "by_flag")
    assert len(after["units"]) == 3
    assert any(u["id"] == dropped["id"] for u in after["units"])


def test_rollup_repeated_compaction_never_reuses_unit_names(spark, sf_dir, tmp_path):
    """Regression: unit ids come from a monotone manifest counter, so a
    second compaction can never regenerate an existing committed unit's
    name (which would overwrite the directory it is concurrently
    reading). Two update/compact cycles -> all ids ever committed are
    distinct and the finalized aggregate stays equal to the full
    recompute."""
    import glob
    import os
    import shutil

    from data_ingestion_api_system_loop_ai_spark.sources import rollup as ru

    p = _rollup_fixture(spark, sf_dir, tmp_path)
    seen_ids = set()

    def _snap():
        ids = {u["id"] for u in ru.load_rollup_manifest(p, "by_flag")["units"]}
        assert not (ids - seen_ids) & seen_ids
        seen_ids.update(ids)

    def _append_file(tag):
        extra = str(tmp_path / f"x{tag}")
        spark.read.parquet(p).limit(100).coalesce(1).write.parquet(extra)
        shutil.copy(
            glob.glob(extra + "/*.parquet")[0],
            os.path.join(p, f"late-{tag}.parquet"),
        )

    ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    _snap()
    _append_file("a")
    ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    _snap()
    ru.compact_rollup(spark, p, "by_flag")
    _snap()
    _append_file("b")
    ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    _snap()
    # the second compaction is the collision case under len()-naming
    ru.compact_rollup(spark, p, "by_flag")
    m = ru.load_rollup_manifest(p, "by_flag")
    assert len(m["units"]) == 1
    new_id = m["units"][0]["id"]
    assert new_id not in seen_ids
    assert _finalized(ru.read_rollup(spark, p, "by_flag")) == _full_recompute(
        spark, p
    )


def test_rollup_vacuum_removes_only_orphans(spark, sf_dir, tmp_path):
    """vacuum_rollup deletes crash-debris unit directories and nothing
    else: finalized results are unchanged and committed units stay."""
    import os

    from data_ingestion_api_system_loop_ai_spark.sources import rollup as ru

    p = _rollup_fixture(spark, sf_dir, tmp_path)
    ru.update_rollup(spark, p, "by_flag", ["l_returnflag"], "l_quantity")
    want = _finalized(ru.read_rollup(spark, p, "by_flag"))

    pdir = os.path.join(p, "_rollup", "by_flag", "partials")
    spark.read.parquet(os.path.join(pdir, "u000000")).write.parquet(
        os.path.join(pdir, "u_orphan1")
    )
    spark.read.parquet(os.path.join(pdir, "u000000")).write.parquet(
        os.path.join(pdir, "u_orphan2")
    )
    st = ru.vacuum_rollup(p, "by_flag")
    assert st == {"removed": 2, "kept": 1}
    assert sorted(os.listdir(pdir)) == ["u000000"]
    assert _finalized(ru.read_rollup(spark, p, "by_flag")) == want
