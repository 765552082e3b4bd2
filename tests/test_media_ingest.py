"""Day-2 media ingest (operators/media_ingest.py — VERDICT r12 #4).

Discipline mirrors tests/test_corpus_ingest.py / test_urls.py: a
DuckDB oracle for the SQL-expressible classification (given the
fingerprints), constructed exact/near/chained/torn fixtures, replay
idempotence, the marker-last crash window, the compaction-superseded
raise, and one real-modality integration (pHash payloads perturbed
within Hamming reach of their day-1 canonicals).
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.operators.media_ingest import (
    _read_fp_index,
    build_media_index,
    compact_media_index,
    incremental_media_dedup,
    ingest_media_batch,
)

# base fingerprint plus controlled-distance variants: NEAR3 flips 3
# bits in band 0 (<= PHASH_MAX_HAMMING -> dup), FAR8 flips 8 bits
# across two bands (> threshold -> kept even though bands 2/3 collide)
BASE = 0x123456789ABCDEF0
NEAR3 = BASE ^ 0b0111
FAR8 = BASE ^ 0x000F000F
OTHER = 0x0F0F0F0F0F0F0F0F


def _mk_hashes(spark, rows):
    return spark.createDataFrame(
        [(a, fp, err) for a, fp, err in rows],
        "asset_id long, fp long, error string",
    )


def test_incremental_media_dedup_two_batches(spark, tmp_path):
    ix = str(tmp_path / "fpix")
    day1 = _mk_hashes(spark, [(1, BASE, None), (2, OTHER, None)])
    build_media_index(day1, ix, spark)

    day2 = _mk_hashes(
        spark,
        [
            (10, BASE, None),       # exact dup of history (canon=1)
            (11, NEAR3, None),      # near dup of history  (canon=1, ham 3)
            (12, FAR8, None),       # 8 bits away -> kept
            (13, FAR8, None),       # in-batch exact dup of 12
            (14, FAR8 ^ 0b1, None), # in-batch near dup of 12 (ham 1)
            (15, None, "torn"),     # error passthrough
        ],
    )
    out = {
        r["asset_id"]: r
        for r in ingest_media_batch(spark, day2, ix, unit="u000001").collect()
    }
    assert out[10]["status"] == "media_dup" and out[10]["matched_id"] == 1
    assert out[10]["hamming"] == 0
    assert out[11]["status"] == "media_dup" and out[11]["matched_id"] == 1
    assert out[11]["hamming"] == 3
    assert out[12]["status"] == "kept" and out[12]["matched_id"] is None
    assert out[13]["status"] == "media_dup" and out[13]["matched_id"] == 12
    assert out[14]["status"] == "media_dup" and out[14]["matched_id"] == 12
    assert out[15]["status"] == "error" and out[15]["fp"] is None

    # day-3 sees day-2's kept canonical (12) in history; the DROPPED
    # near variant (14) was never indexed, so a fingerprint 4 bits
    # from canonical 12 is KEPT — one-hop canonical semantics.
    # (Probed separately: batched together, 20 and 21 are within
    # Hamming 3 of EACH OTHER and 21 would be claimed in-batch by 20.)
    v20 = incremental_media_dedup(
        spark, _mk_hashes(spark, [(20, FAR8 ^ 0b10, None)]), ix
    ).collect()[0]
    assert v20["status"] == "media_dup" and v20["matched_id"] == 12
    v21 = incremental_media_dedup(
        spark, _mk_hashes(spark, [(21, FAR8 ^ 0b11110, None)]), ix
    ).collect()[0]
    assert v21["status"] == "kept"
    # batched together, the in-batch one-hop claim applies: 21 is a
    # media_dup of the EARLIER asset 20 (itself a history dup — the
    # claim is one hop, like every family's near_id)
    both = {
        r["asset_id"]: r
        for r in incremental_media_dedup(
            spark,
            _mk_hashes(
                spark, [(20, FAR8 ^ 0b10, None), (21, FAR8 ^ 0b11110, None)]
            ),
            ix,
        ).collect()
    }
    assert both[20]["status"] == "media_dup" and both[20]["matched_id"] == 12
    assert both[21]["status"] == "media_dup" and both[21]["matched_id"] == 20


def test_media_classifier_duckdb_oracle(spark, tmp_path):
    """GIVEN the fingerprints the whole classification is relational —
    pin it against an independent DuckDB implementation of the same
    semantics (exact/near vs history, one-hop first-wins in batch,
    history precedence, nearest-then-smallest tiebreak)."""
    ix = str(tmp_path / "fpix")
    # hist canonicals pairwise > Hamming 3 apart (so the day-1 build
    # keeps all three and the index equals the oracle's hist table)
    hist_rows = [(BASE, 1), (OTHER, 2), (OTHER ^ 0b1111, 7)]
    build_media_index(
        _mk_hashes(spark, [(c, fp, None) for fp, c in hist_rows]), ix, spark
    )
    batch_rows = [
        (10, BASE), (11, NEAR3), (12, FAR8), (13, FAR8), (14, FAR8 ^ 0b1),
        (16, OTHER ^ 0b0111),  # ham 3 to hist 2, ham 1 to hist 7
        # sign-bit flip (two's-complement wrap to a NEGATIVE long —
        # pins the arithmetic >> band extraction): ham 1 to hist 1
        (17, (BASE ^ (1 << 63)) - (1 << 64)),
    ]
    got = sorted(
        (r["asset_id"], r["status"], r["matched_id"], r["hamming"])
        for r in incremental_media_dedup(
            spark, _mk_hashes(spark, [(a, fp, None) for a, fp in batch_rows]),
            ix,
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE batch(asset_id BIGINT, fp BIGINT)")
    con.executemany("INSERT INTO batch VALUES (?, ?)", batch_rows)
    con.execute("CREATE TABLE hist(fp BIGINT, canonical_id BIGINT)")
    con.executemany("INSERT INTO hist VALUES (?, ?)", hist_rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                """
WITH hh AS (
  SELECT b.fp,
         min({'h': bit_count(xor(b.fp, h.fp)), 'c': h.canonical_id}) AS hb
  FROM (SELECT DISTINCT fp FROM batch) b
  JOIN hist h ON bit_count(xor(b.fp, h.fp)) <= 3
  GROUP BY b.fp
),
firsts AS (SELECT fp, min(asset_id) AS first_id FROM batch GROUP BY fp),
sp AS (
  SELECT a.fp, f.first_id, bit_count(xor(a.fp, o.fp)) AS h
  FROM (SELECT DISTINCT fp FROM batch) a
  JOIN (SELECT DISTINCT fp FROM batch) o
    ON bit_count(xor(a.fp, o.fp)) <= 3
  JOIN firsts f ON f.fp = o.fp
),
ver AS (
  SELECT b.asset_id, b.fp,
         struct_extract(hh.hb, 'c') AS hist_id,
         struct_extract(hh.hb, 'h') AS hist_ham,
         min(CASE WHEN sp.first_id < b.asset_id
                  THEN {'h': sp.h, 'c': sp.first_id} END) AS bb
  FROM batch b
  LEFT JOIN hh ON hh.fp = b.fp
  LEFT JOIN sp ON sp.fp = b.fp
  GROUP BY ALL
)
SELECT asset_id,
       CASE WHEN hist_id IS NOT NULL OR bb IS NOT NULL
            THEN 'media_dup' ELSE 'kept' END AS status,
       coalesce(hist_id, struct_extract(bb, 'c')) AS matched_id,
       CAST(coalesce(hist_ham, struct_extract(bb, 'h')) AS INT) AS hamming
FROM ver ORDER BY asset_id
"""
            ).fetchall(),
        )
    )
    assert got == want


def test_media_ingest_replay_idempotent(spark, tmp_path):
    ix = str(tmp_path / "fpix")
    build_media_index(_mk_hashes(spark, [(1, BASE, None)]), ix, spark)
    batch = _mk_hashes(spark, [(10, OTHER, None), (11, BASE, None)])
    first = sorted(
        map(tuple, ingest_media_batch(spark, batch, ix, unit="u000001").collect())
    )
    second = sorted(
        map(tuple, ingest_media_batch(spark, batch, ix, unit="u000001").collect())
    )
    assert first == second
    rows = _read_fp_index(spark, ix).collect()
    assert [(r["fp"], r["canonical_id"]) for r in rows if r["fp"] == OTHER] == [
        (OTHER, 10)
    ]


def test_media_ingest_crash_window_marker_last(spark, tmp_path):
    ix = str(tmp_path / "fpix")
    build_media_index(_mk_hashes(spark, [(1, BASE, None)]), ix, spark)
    # a crash BETWEEN the unit parquet write and the marker commit:
    # rows on disk, no marker -> invisible to every read
    spark.createDataFrame(
        [(OTHER, 99)], "fp long, canonical_id long"
    ).write.mode("overwrite").parquet(os.path.join(ix, "fp", "unit=u000009"))
    v = incremental_media_dedup(
        spark, _mk_hashes(spark, [(100, OTHER, None)]), ix
    ).collect()[0]
    assert v["status"] == "kept"


def test_media_ingest_replay_after_compaction_raises(spark, tmp_path):
    ix = str(tmp_path / "fpix")
    build_media_index(_mk_hashes(spark, [(1, BASE, None)]), ix, spark)
    batch = _mk_hashes(spark, [(10, OTHER, None)])
    ingest_media_batch(spark, batch, ix, unit="u000001")
    assert compact_media_index(spark, ix)["compacted_units"] == 2
    with pytest.raises(RuntimeError, match="compacted away"):
        ingest_media_batch(spark, batch, ix, unit="u000001")


def test_compact_media_index_preserves_verdicts(spark, tmp_path):
    ix = str(tmp_path / "fpix")
    build_media_index(_mk_hashes(spark, [(1, BASE, None)]), ix, spark)
    ingest_media_batch(
        spark, _mk_hashes(spark, [(10, OTHER, None)]), ix, unit="u000001"
    )
    probe = _mk_hashes(spark, [(20, NEAR3, None), (21, OTHER, None)])
    before = sorted(
        map(tuple, incremental_media_dedup(spark, probe, ix).collect())
    )
    info = compact_media_index(spark, ix)
    assert info["compacted_units"] == 2 and info["rows"] == 2
    after = sorted(
        map(tuple, incremental_media_dedup(spark, probe, ix).collect())
    )
    assert before == after
    # superseded unit dirs physically gone, one c-unit remains
    units = os.listdir(os.path.join(ix, "fp"))
    assert [u for u in units if u.startswith("unit=")] == [
        f"unit={info['unit']}"
    ]


def test_media_ingest_exact_matches_from_scratch(spark, tmp_path):
    """For EXACT dups (the near rule is one-hop and history indexes
    canonicals only, so near chains legitimately diverge from a
    single-batch run) incremental across days == the day-1 build over
    the union, when asset ids increase with time."""
    ix = str(tmp_path / "fpix")
    ix2 = str(tmp_path / "fpix2")
    day1 = [(1, BASE, None), (2, OTHER, None), (3, BASE, None)]
    day2 = [(10, BASE, None), (11, FAR8, None), (12, FAR8, None)]
    build_media_index(_mk_hashes(spark, day1), ix, spark)
    v2 = ingest_media_batch(
        spark, _mk_hashes(spark, day2), ix, unit="u000001"
    ).collect()
    inc_kept = {1, 2} | {r["asset_id"] for r in v2 if r["status"] == "kept"}
    build_media_index(_mk_hashes(spark, day1 + day2), ix2, spark)
    scratch_kept = {
        r["canonical_id"] for r in _read_fp_index(spark, ix2).collect()
    }
    assert inc_kept == scratch_kept


def test_media_ingest_real_phash_modality(spark, tmp_path):
    """Integration over REAL pHash fingerprints: day-1 canonical
    payloads, a day-2 batch of a byte-identical copy plus mildly
    re-graded copies (perturb_raster). Perturbation stays within
    Hamming reach for the large MAJORITY (the B120 measured property,
    >= 0.8), so the near assertions run on the copies MEASURED within
    reach — deterministic, no flake."""
    from data_ingestion_api_system_loop_ai_spark.operators.phash import (
        PHASH_MAX_HAMMING,
        hamming64,
        perturb_raster,
        phash64,
        smooth_raster,
    )

    ix = str(tmp_path / "fpix")
    day1_ids = list(range(8))

    def _dims(i):
        return 48 + (i * 5) % 32, 48 + (i * 3) % 32

    rasters = {i: smooth_raster(*_dims(i), seed=i) for i in day1_ids}
    day1_fp = {i: phash64(*_dims(i), rasters[i]) for i in day1_ids}
    build_media_index(
        _mk_hashes(spark, [(i, day1_fp[i], None) for i in day1_ids]),
        ix,
        spark,
    )
    near_ids, rows = [], [(200, day1_fp[0], None)]
    for i in day1_ids:
        w, h = _dims(i)
        fp = phash64(w, h, perturb_raster(rasters[i]))
        if 0 < hamming64(fp, day1_fp[i]) <= PHASH_MAX_HAMMING:
            near_ids.append(i)
            rows.append((100 + i, fp, None))
    assert near_ids, "no perturbed copy landed within Hamming reach"
    out = {
        r["asset_id"]: r
        for r in ingest_media_batch(
            spark, _mk_hashes(spark, rows), ix, unit="u000001"
        ).collect()
    }
    assert out[200]["status"] == "media_dup" and out[200]["matched_id"] == 0
    assert out[200]["hamming"] == 0
    for i in near_ids:
        r = out[100 + i]
        assert r["status"] == "media_dup" and r["matched_id"] == i
        assert 0 < r["hamming"] <= PHASH_MAX_HAMMING
