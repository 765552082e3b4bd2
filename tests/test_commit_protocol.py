"""Shared commit protocol (VERDICT r04 #7) + transactional ANN appends
(#1) + ANN compaction (#6).

One rename primitive now backs all four persisted artifacts (serving
pointer, dedup units, ANN units, rollup manifests); this suite tests
the primitive once and then the two new ANN behaviors built on it:
crash-between-writes invisibility with replay healing, and compaction
under marker supersession with pinned probe results.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.sources import commit_protocol as cp


# ---------------------------------------------------------------------------
# protocol primitives
# ---------------------------------------------------------------------------


def test_atomic_write_text_replaces_and_leaves_no_temp(tmp_path):
    p = str(tmp_path / "nested" / "pointer")
    cp.atomic_write_text(p, "1")
    cp.atomic_write_text(p, "2")  # replace, not append
    with open(p) as f:
        assert f.read() == "2"
    assert os.listdir(os.path.dirname(p)) == ["pointer"]  # no temp debris


def test_unit_markers_supersession_and_label_allocation(tmp_path):
    root = str(tmp_path / "art")
    cp.commit_unit(root, "u000000")
    cp.commit_unit(root, "u000001")
    assert cp.committed_units(root) == ["u000000", "u000001"]
    # compaction retires both in the same marker
    cp.commit_unit(root, "c000000", supersedes=["u000000", "u000001"])
    assert cp.committed_units(root) == ["c000000"]
    # a crashed cleanup leaves the old markers behind — they must STAY
    # shadowed even after the compaction marker itself is superseded
    cp.commit_unit(root, "c000001", supersedes=["c000000"])
    assert cp.committed_units(root) == ["c000001"]
    # label allocation skips used AND superseded names (reusing a
    # superseded label would commit silently-invisible history)
    assert cp.next_unit_label(root) == "u000002"
    assert cp.next_unit_label(root, prefix="c") == "c000002"


def test_require_marker_message_names_builder(tmp_path):
    with pytest.raises(FileNotFoundError, match="run build_thing"):
        cp.require_marker(str(tmp_path / "x"), what="thing", builder="build_thing")
    cp.write_marker(str(tmp_path / "x"))
    cp.require_marker(str(tmp_path / "x"), what="thing", builder="build_thing")


# ---------------------------------------------------------------------------
# transactional ANN appends (VERDICT r04 #1)
# ---------------------------------------------------------------------------


def _two_copies(spark, sf_dir, base_id):
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    src = (
        load_table(spark, sf_dir, "embeddings").orderBy("vec_id").limit(2).collect()
    )
    return src, spark.createDataFrame(
        [(base_id + i, r["embedding"]) for i, r in enumerate(src)],
        "vec_id long, embedding array<float>",
    )


def test_ann_append_crash_between_writes_is_invisible_then_heals(
    spark, sf_dir, tmp_path
):
    """The exact r4 hazard: crash AFTER the assignments write, BEFORE
    the pq_codes write. The torn unit must be invisible to every probe
    form (assignments-readers and pq-readers can never disagree about
    membership), and replaying the append with the same unit label must
    heal it."""
    from data_ingestion_api_system_loop_ai_spark.operators import ann_index as ai
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        ivf_assign,
    )

    ix = str(tmp_path / "ann_ix")
    ai.build_ann_index(spark, sf_dir, ix)
    src, new_vecs = _two_copies(spark, sf_dir, 910000)

    # crash injection: run ONLY the first half of append_ann_index —
    # the assignments unit write — and stop before pq_codes/marker
    label = cp.next_unit_label(ix)
    seeds = spark.read.parquet(os.path.join(ix, "seeds"))
    ivf_assign(new_vecs, seeds=seeds).write.mode("overwrite").parquet(
        os.path.join(ix, "assignments", f"unit={label}")
    )

    # both unit tables agree the vectors do NOT exist (torn unit invisible)
    asg_ids = {
        r["vec_id"]
        for r in ai._read_units(spark, ix, "assignments")
        .filter(F.col("vec_id") >= 910000)
        .collect()
    }
    code_ids = {
        r["vec_id"]
        for r in ai._read_units(spark, ix, "pq_codes")
        .filter(F.col("vec_id") >= 910000)
        .collect()
    }
    assert asg_ids == set() and code_ids == set()

    # replay with the SAME unit label (a streaming maintainer derives it
    # from the batch id): overwrites the torn directory and commits
    committed = ai.append_ann_index(spark, new_vecs, ix, unit=label)
    assert committed == label
    asg_after = {
        r["vec_id"]: r["cell"]
        for r in ai._read_units(spark, ix, "assignments")
        .filter(F.col("vec_id") >= 910000)
        .collect()
    }
    codes_after = {
        r["vec_id"]
        for r in ai._read_units(spark, ix, "pq_codes")
        .filter(F.col("vec_id") >= 910000)
        .collect()
    }
    # every probe form sees the SAME membership: both tables carry
    # exactly the appended ids, assigned to their copies' frozen cells
    assert set(asg_after) == codes_after == {910000, 910001}
    base_cells = {
        r["vec_id"]: r["cell"]
        for r in ai._read_units(spark, ix, "assignments")
        .filter(F.col("vec_id").isin(*[r["vec_id"] for r in src]))
        .collect()
    }
    for i, r in enumerate(src):
        assert asg_after[910000 + i] == base_cells[r["vec_id"]]


def test_ann_compaction_pins_probe_results_and_drops_files(
    spark, sf_dir, tmp_path
):
    """compact_ann_index folds build+append units into one c-unit:
    every probe form returns bit-identical results before/after, the
    file count drops, and superseded unit directories are swept."""
    from data_ingestion_api_system_loop_ai_spark.operators import ann_index as ai
    from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
        parquet_files,
    )

    ix = str(tmp_path / "ann_ix_c")
    ai.build_ann_index(spark, sf_dir, ix)
    _, batch1 = _two_copies(spark, sf_dir, 920000)
    _, batch2 = _two_copies(spark, sf_dir, 930000)
    ai.append_ann_index(spark, batch1, ix)
    ai.append_ann_index(spark, batch2, ix)
    assert len(cp.committed_units(ix)) == 3

    def probe_state():
        return (
            sorted(
                map(tuple, ai.q_similarity_ivf_from_index(spark, sf_dir, ix).collect())
            ),
            sorted(
                map(tuple, ai.q_similarity_pq_from_index(spark, sf_dir, ix).collect())
            ),
            sorted(
                map(
                    tuple,
                    ai.q_knn_graph_from_index(spark, sf_dir, ix)
                    .select("query_id", "neighbor_id", "rnk")
                    .collect(),
                )
            ),
            # the stored-edge graph reader (VERDICT r10 #1) is pinned
            # across compaction too: the c-unit materializes exactly
            # the read-time max-merge top-k
            sorted(
                map(tuple, ai.read_knn_edges(spark, ix).collect())
            ),
        )

    before = probe_state()
    files_pre = sum(
        len(parquet_files(os.path.join(ix, t)))
        for t in ("assignments", "pq_codes", "edges")
    )
    summary = ai.compact_ann_index(spark, ix)
    assert summary["compacted_units"] == 3
    assert summary["files_after"] < files_pre == summary["files_before"]
    assert cp.committed_units(ix) == [summary["unit"]]
    # superseded unit directories are gone (lazy cleanup ran)
    for t in ("assignments", "pq_codes", "edges"):
        units_on_disk = {
            d for d in os.listdir(os.path.join(ix, t)) if d.startswith("unit=")
        }
        assert units_on_disk == {f"unit={summary['unit']}"}
    assert probe_state() == before
    # idempotent: a second compaction with one unit is a no-op
    again = ai.compact_ann_index(spark, ix)
    assert again["compacted_units"] == 0
