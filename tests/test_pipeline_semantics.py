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
