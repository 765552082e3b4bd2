"""CLI surface: list/run/status mirror the reference's API ergonomics
(POST /ingest has its analytics in the pipeline queries; GET /status is
the `status` command, including the 404 case)."""

from __future__ import annotations

import json

from data_ingestion_api_system_loop_ai_spark.cli import main
from data_ingestion_api_system_loop_ai_spark.operators.pipeline import requests


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q_pipeline_e2e" in out
    assert "sql-oracle" in out and "rows-only" in out


def test_cli_run_emits_json_rows(spark, sf_dir, capsys):
    assert main(["run", "q_hash_agg", "--sf-dir", sf_dir, "--limit", "3"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 1 <= len(lines) <= 3
    row = json.loads(lines[0])
    assert "l_returnflag" in row and "sum_qty" in row


def test_cli_status_found_and_404(spark, sf_dir, capsys):
    some_id = requests(spark, sf_dir).select("request_id").first()["request_id"]
    assert main(["status", some_id, "--sf-dir", sf_dir]) == 0
    out = json.loads(capsys.readouterr().out)
    # exact reference 200 shape (ingestController.js:46-54): key order,
    # ids as real JSON arrays, batch-level statuses
    assert list(out.keys()) == ["ingestion_id", "status", "batches"]
    assert out["ingestion_id"] == some_id
    assert out["status"] in {"yet_to_start", "triggered", "completed"}
    assert out["batches"] and all(
        list(b.keys()) == ["batch_id", "ids", "status"]
        and isinstance(b["ids"], list)
        and all(isinstance(x, int) for x in b["ids"])
        and b["status"] in {"yet_to_start", "triggered", "completed", "failed"}
        for b in out["batches"]
    )

    assert main(["status", "no-such-id", "--sf-dir", sf_dir]) == 1
    # byte-exact reference 404 body (ingestController.js:39-41)
    assert json.loads(capsys.readouterr().out) == {
        "error": "Ingestion ID not found."
    }
