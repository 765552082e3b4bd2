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
    # round-9 rotation: zero rows-only slots remain (q_assign_ids moved
    # to the direct-tested unregistered surface)
    assert "sql-oracle" in out and "direct-test" in out
    assert "rows-only" not in out
    # the direct-tested unregistered surface is listed and runnable too
    assert "direct-test" in out and "q_winnow_pairs" in out


def test_cli_run_unregistered_query(spark, sf_dir, capsys):
    assert (
        main(["run", "q_lm_score", "--sf-dir", sf_dir, "--limit", "2"]) == 0
    )
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert lines and "mean_surprisal" in lines[0]


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
    # byte-exact reference 404 body (ingestController.js:39-41):
    # JSON.stringify layout — compact separators, trailing period
    assert (
        capsys.readouterr().out.strip()
        == '{"error":"Ingestion ID not found."}'
    )


def test_cli_compact_roundtrip(spark, sf_dir, tmp_path, capsys):
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    src = str(tmp_path / "frag")
    load_table(spark, sf_dir, "events").repartition(16).write.mode(
        "overwrite"
    ).parquet(src)
    dst = str(tmp_path / "out")
    assert main(["compact", src, dst, "--target-mb", "1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["written_files"] <= 16
    assert (
        spark.read.parquet(dst).count() == spark.read.parquet(src).count()
    )


def test_cli_ingest_emits_reference_bodies(spark, tmp_path, capsys):
    """POST /ingest write path: one response line per request in input
    order — 202 {"ingestion_id": uuid} for valid, byte-exact reference
    400 bodies for each invalid shape (ingestController.js:10-15,32)."""
    req_file = tmp_path / "requests.jsonl"
    req_file.write_text(
        "\n".join(
            [
                '{"ids": [1, 2, 3, 4], "priority": "high"}',
                '{"ids": [], "priority": "HIGH"}',
                '{"ids": [5], "priority": "URGENT"}',
                '{"ids": [6]}',
                "{not json",
            ]
        )
    )
    assert main(["ingest", str(req_file)]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 5
    ok = json.loads(lines[0])
    assert list(ok.keys()) == ["ingestion_id"]
    assert len(ok["ingestion_id"]) == 36  # uuidv4 wire shape
    ids_err = '{"error":"Invalid input: ids array is required and cannot be empty."}'
    prio_err = (
        '{"error":"Invalid input: priority is required and must be HIGH, MEDIUM, or LOW."}'
    )
    assert lines[1] == ids_err  # empty ids array
    assert lines[2] == prio_err  # invalid priority enum
    assert lines[3] == prio_err  # missing priority
    assert lines[4] == ids_err  # malformed JSON -> null fields


def test_cli_health_is_reference_exact(spark, capsys):
    """A13: the reference's liveness body, byte-exact (src/app.js:11-13),
    backed by a real engine check (registry intact + live session)."""
    assert main(["health"]) == 0
    assert capsys.readouterr().out == "Data Ingestion API is running!\n"


def test_cli_status_from_store(spark, tmp_path, capsys):
    """The --store read path end to end through the CLI."""
    from data_ingestion_api_system_loop_ai_spark.streaming.live import (
        register_requests_sink,
        requests_json_stream,
    )
    from data_ingestion_api_system_loop_ai_spark.streaming.serving import (
        ServingTable,
    )

    req_dir = tmp_path / "cli_store_reqs"
    req_dir.mkdir()
    (req_dir / "f1.json").write_text(
        json.dumps({"request_id": "42", "priority": "HIGH",
                    "created_at_ms": 1000, "ids": [1, 2, 3, 4]}) + "\n"
    )
    table = ServingTable(
        str(tmp_path / "cli_store"),
        key_cols=["batch_id"],
        seq_col="drain_seq",
        bucket_cols=["request_id"],
    )
    register_requests_sink(
        requests_json_stream(spark, str(req_dir)),
        table,
        checkpoint=str(tmp_path / "cli_store_ckpt"),
    ).awaitTermination()

    assert main(["status", "42", "--store", table.path]) == 0
    body = json.loads(capsys.readouterr().out)
    assert body["ingestion_id"] == "42"
    assert body["status"] == "yet_to_start"  # registered, nothing drained
    assert [b["ids"] for b in body["batches"]] == [[1, 2, 3], [4]]

    assert main(["status", "nope", "--store", table.path]) == 1
    assert capsys.readouterr().out.strip() == '{"error":"Ingestion ID not found."}'


def test_cli_changes_reports_cdc_rows(spark, tmp_path, capsys):
    from data_ingestion_api_system_loop_ai_spark.streaming.serving import (
        ServingTable,
    )

    schema = "k string, seq long, val string"
    store = str(tmp_path / "cdc_store")
    t = ServingTable(store, key_cols=["k"], seq_col="seq", num_buckets=4)
    t.upsert(spark.createDataFrame([("a", 1, "x"), ("b", 1, "y")], schema))
    t.upsert(spark.createDataFrame([("a", 2, "x2"), ("c", 1, "z")], schema))
    # the command reopens the store cold: key/seq/bucket config must come
    # from the pinned on-disk table config, not the CLI's defaults
    assert main(["changes", store]) == 0
    rows = [
        json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()
    ]
    got = {r["k"]: r["change_type"] for r in rows}
    assert got == {"a": "update", "c": "insert"}
    # explicit full-history window: everything is an insert
    assert main(["changes", store, "--from-version", "-1"]) == 0
    rows = [
        json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()
    ]
    assert {r["k"]: r["change_type"] for r in rows} == {
        "a": "insert", "b": "insert", "c": "insert",
    }


def test_cli_rebucket_scales_store(spark, tmp_path, capsys):
    from data_ingestion_api_system_loop_ai_spark.streaming.serving import (
        ServingTable,
    )

    schema = "k string, seq long, val string"
    store = str(tmp_path / "rb_store")
    t = ServingTable(store, key_cols=["k"], seq_col="seq", num_buckets=2)
    t.upsert(spark.createDataFrame([(f"k{i}", 1, "v") for i in range(12)], schema))
    assert main(["rebucket", store, "8"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["num_buckets"] == 8
    cold = ServingTable(store, key_cols=["k"], seq_col="seq")
    assert cold.num_buckets == 8
    assert cold.lookup(spark, k="k7").collect()[0]["val"] == "v"


def test_cli_analyze_builds_and_refreshes_stats(spark, sf_dir, tmp_path, capsys):
    import json as _json

    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    ds = str(tmp_path / "analyzed")
    load_table(spark, sf_dir, "events").repartition(3).write.mode(
        "overwrite"
    ).parquet(ds)
    assert main(["analyze", ds, "--cols", "event_id,user_id"]) == 0
    s1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["added"] == 3 and s1["reused"] == 0 and s1["total"] == 3
    # refresh with no new files: all rows reused, zero footer reads
    assert main(["analyze", ds, "--cols", "event_id,user_id"]) == 0
    s2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["added"] == 0 and s2["reused"] == 3 and s2["total"] == 3


def test_cli_index_and_dedup_roundtrip(spark, sf_dir, tmp_path, capsys):
    import json as _json

    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    docs_p = str(tmp_path / "docs_src")
    seed = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    seed.write.mode("overwrite").parquet(docs_p)
    ix = str(tmp_path / "cli_ix")
    assert main(["index", docs_p, ix]) == 0
    built = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["indexed_docs"] == 50

    dup_text = seed.filter(F.col("doc_id") == 9).collect()[0]["text"]
    batch_p = str(tmp_path / "batch_src")
    spark.createDataFrame(
        [(9000, dup_text), (9001, "unindexed cli words " * 10)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(batch_p)
    assert main(["dedup", batch_p, ix]) == 0
    lines = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    by_id = {r["doc_id"]: r for r in lines}
    assert by_id[9000]["status"] == "exact_dup" and by_id[9000]["matched_id"] == 9
    assert by_id[9001]["status"] == "kept"


def test_cli_explain_funnel_reconciles(spark, sf_dir, capsys):
    """explain-funnel's stage histogram must account for every input
    document exactly once (first-drop attribution is a partition)."""
    assert main(["explain-funnel", sf_dir, "--docs", "2"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    hist = json.loads(lines[0])["stages"]
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    assert sum(hist.values()) == load_table(spark, sf_dir, "documents").count()
    assert hist.get("kept", 0) > 0
    # one line of sample doc ids per non-kept stage
    assert len(lines) == 1 + sum(1 for s in hist if s != "kept")


def test_cli_train_and_classify(spark, sf_dir, tmp_path, capsys):
    """train-classifier persists a frozen model; classify scores from
    it and reports the positive count."""
    mp = str(tmp_path / "cli_clf")
    assert main(["train-classifier", sf_dir, mp, "--iters", "3"]) == 0
    assert json.loads(capsys.readouterr().out.splitlines()[-1])["iters"] == 3
    assert main(["classify", sf_dir, mp, "--limit", "2"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rows = [json.loads(l) for l in lines]
    assert len(rows) == 3  # 2 docs + the summary line
    assert all(0.0 <= r["p"] <= 1.0 for r in rows[:-1])
    assert rows[-1]["n_predicted_positive"] >= 0


def test_cli_overlap_builds_and_probes_sketches(spark, sf_dir, tmp_path, capsys):
    """overlap: inline and persisted-sketch probes emit the same
    readout; the sketch build happens on first use."""
    assert main(["overlap", sf_dir]) == 0
    inline = json.loads(capsys.readouterr().out.splitlines()[-1])
    sk = str(tmp_path / "cli_kmv")
    assert main(["overlap", sf_dir, "--sketches", sk]) == 0
    frozen = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert frozen == inline
    assert set(inline) == {
        "n_a_est", "n_b_est", "union_est", "inter_est", "jaccard_est"
    }
    import os

    assert os.path.exists(os.path.join(sk, "_COMMITTED"))


def test_cli_build_corpus_no_report(spark, sf_dir, tmp_path, capsys):
    """`--no-report` (ADVICE r07: the RUNBOOK production setting must
    be reachable from the entrypoint) skips every per-stage count —
    the extra corpus passes — but still writes and counts shards."""
    out_dir = str(tmp_path / "shards_nr")
    assert main(
        ["build-corpus", sf_dir, out_dir, "--records-per-file", "200",
         "--no-report"]
    ) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["input"] is None and rep["after_exact"] is None
    assert rep["rows_written"] > 0


def test_cli_explain_funnel_curated_stages(spark, sf_dir, capsys):
    """`explain-funnel --curated` reports the model-gate stages the
    heuristic form does not have."""
    assert main(["explain-funnel", sf_dir, "--curated"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "classifier_rejected" in out["stages"]
    assert "semantic_dup" in out["stages"]


def test_build_artifacts_rejects_unknown_skip(spark, sf_dir, tmp_path):
    """A typo'd --skip family must fail loudly, not silently build the
    expensive artifact anyway (ADVICE r07)."""
    import pytest

    from data_ingestion_api_system_loop_ai_spark.operators.curated_corpus import (
        build_corpus_artifacts,
    )

    with pytest.raises(ValueError, match="anns"):
        build_corpus_artifacts(
            spark, sf_dir, str(tmp_path / "r"), skip=("anns",)
        )
