"""Direct semantic checks of the Tier-A status machine, including the
'failed' arm (reference ``ingestService.js:78,89`` + ``README.md:66``:
a batch that throws ends 'failed'; the overall rollup has no 'failed'
state, so such a request reports 'triggered' via the else branch of
``calculateOverallStatus``, ``ingestService.js:15-35``)."""

from __future__ import annotations

from data_ingestion_api_system_loop_ai_spark.operators.pipeline import (
    FAILED_ID_MOD,
    FAILED_ID_REM,
    q_overall_status,
    schedule,
)


def _poisoned(ids) -> bool:
    return any(x % FAILED_ID_MOD == FAILED_ID_REM for x in ids)


def test_failed_arm_is_exercised_and_deterministic(spark, sf_dir):
    rows = schedule(spark, sf_dir).select(
        "request_id", "batch_id", "batch_ids", "status"
    ).collect()
    statuses = {r["status"] for r in rows}
    assert "failed" in statuses, "fixture must exercise the failed arm"
    assert statuses <= {"yet_to_start", "triggered", "completed", "failed"}
    for r in rows:
        if r["status"] == "failed":
            assert _poisoned(r["batch_ids"])
        if r["status"] == "completed":
            assert not _poisoned(r["batch_ids"])


def test_request_with_failed_batch_rolls_up_triggered(spark, sf_dir):
    """Reference else-branch: not all yet_to_start (a failed batch ran)
    and not all completed (a failed batch is not completed) => triggered."""
    per_batch = schedule(spark, sf_dir).select("request_id", "status").collect()
    failed_reqs = {r["request_id"] for r in per_batch if r["status"] == "failed"}
    assert failed_reqs, "fixture must contain a request with a failed batch"
    overall = {
        r["request_id"]: r["status"]
        for r in q_overall_status(spark, sf_dir).collect()
    }
    for req in failed_reqs:
        assert overall[req] == "triggered"


def test_build_training_corpus_funnel_and_shards(spark, sf_dir, tmp_path):
    """The end-to-end corpus build: funnel counts are monotone
    non-increasing, every written doc survives every verdict (no eval
    ids, no near-dup doc_b, no contaminated, quality-kept only, unique
    doc_ids), epoch multiplicities are >= 1, shard files respect the
    records_per_file bound, and shuffle positions are a dense
    permutation."""
    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.operators.contamination import (
        EVAL_MOD,
        EVAL_REM,
        q_decontaminate,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.corpus_pipeline import (
        build_training_corpus,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.dedup import (
        q_dedup_prefix,
    )

    out = str(tmp_path / "training_shards")
    rep = build_training_corpus(spark, sf_dir, out, records_per_file=64)

    assert (
        rep["input"]
        >= rep["after_exact"]
        >= rep["after_near"]
        >= rep["after_quality"]
        >= rep["after_decontam"]
        >= rep["rows_written"]
    )
    assert rep["rows_written"] > 0 and rep["n_shard_files"] >= 1

    df = spark.read.parquet(out)
    rows = df.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(i % EVAL_MOD != EVAL_REM for i in ids)
    assert all(r["n_copies"] >= 1 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)

    dropped_near = {
        r["doc_b"] for r in q_dedup_prefix(spark, sf_dir).collect()
    }
    assert not (set(ids) & dropped_near)
    contaminated = {
        r["doc_id"]
        for r in q_decontaminate(spark, sf_dir).filter("contaminated").collect()
    }
    assert not (set(ids) & contaminated)

    pos = sorted(r["shuffle_pos"] for r in rows)
    assert pos == list(range(1, len(rows) + 1))

    # shard-file bound: every parquet file holds <= records_per_file rows
    import glob
    import os

    for f in glob.glob(os.path.join(out, "*.parquet")):
        import pyarrow.parquet as pq

        assert pq.read_metadata(f).num_rows <= 64


def test_assign_ids_semantics_pinned(spark, sf_dir):
    """A4 pin (round-9 rotation: q_assign_ids left the registry because
    uuid()/current_timestamp() can never hash-match an oracle —
    reference ``ingestController.js:17-18`` is nondeterministic by its
    own semantics). Everything deterministic about it IS pinned here:
    one row per request, RFC-4122 v4 ingestion_id, unique per request,
    n_ids equal to the request's ids length, and assigned_at inside the
    run window."""
    import datetime
    import re

    from data_ingestion_api_system_loop_ai_spark.operators.pipeline import (
        q_assign_ids,
        requests,
    )

    t0 = datetime.datetime.now() - datetime.timedelta(minutes=10)
    rows = q_assign_ids(spark, sf_dir).collect()
    t1 = datetime.datetime.now() + datetime.timedelta(minutes=10)
    base = {
        r["request_id"]: len(r["ids"])
        for r in requests(spark, sf_dir).select("request_id", "ids").collect()
    }
    assert len(rows) == len(base)
    uuid4 = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    seen = set()
    for r in rows:
        assert uuid4.match(r["ingestion_id"]), r["ingestion_id"]
        assert r["ingestion_id"] not in seen
        seen.add(r["ingestion_id"])
        assert r["n_ids"] == base[r["request_id"]]
        at = r["assigned_at"]
        if at.tzinfo is not None:
            at = at.astimezone().replace(tzinfo=None)
        assert t0 <= at <= t1
