"""Unified day-2 corpus ingest (VERDICT r11 #4, ``operators/
corpus_ingest.py``): one WARC micro-batch through the FULL curated
funnel against frozen artifacts + persisted indexes.

- verdict semantics over planted cross-batch / in-batch duplicates
  (text exact dup, semantic embedding dup) and the gate attribution;
- N sequential doc_id-ordered batches ≡ one batch over the union
  (curated rows AND report rows);
- the crash matrix: kill between every adjacent durable-effect pair
  across all five stores, replay the batch id, pin convergence to the
  never-crashed state (the crawl-funnel matrix extended through the
  whole cycle).
"""

import os
import shutil
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators import corpus_ingest as ci
from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

DIM = 64


def _vec(i: int) -> list[float]:
    return [float(((i * 37 + j * 13) % 101) - 50) for j in range(DIM)]


def _html(text: str) -> str:
    return f"<html><body><h1>t</h1><p>{text}</p></body></html>"


@pytest.fixture(scope="module")
def day2_env(spark, sf_dir, tmp_path_factory):
    """Frozen artifacts (text models, classifier, holdout, ANN index)
    + six corpus texts whose EXTRACTED page content passes every pure
    and frozen gate — selected by running the gates themselves, so the
    planted-case tests cannot drift from the gate definitions."""
    from data_ingestion_api_system_loop_ai_spark.operators.ann_index import (
        build_ann_index,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.classifier import (
        build_classifier_model,
        score_documents,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.contamination import (
        contamination_report,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.html_extract import (
        extract_main_content,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.lm_score import (
        lm_scores,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.quality import (
        quality_profile,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.text_models import (
        build_text_models,
    )

    base = tmp_path_factory.mktemp("day2")
    models = str(base / "models")
    build_text_models(spark, sf_dir, os.path.join(models, "text_models"))
    build_classifier_model(spark, sf_dir, os.path.join(models, "classifier"))
    ci.freeze_holdout(spark, sf_dir, models)
    ann = str(base / "ann0")
    build_ann_index(spark, sf_dir, ann)

    # candidate texts -> extracted content -> all gates; keep passers
    cand = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 80)
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    pages = spark.createDataFrame(
        [(r["doc_id"], _html(r["text"])) for r in cand],
        "doc_id long, html string",
    )
    content = extract_main_content(pages).select(
        "doc_id", F.col("content").alias("text")
    )
    q = quality_profile(content).filter("keep").select("doc_id")
    hold = ci._eval_holdout(spark, models)
    cont = (
        contamination_report(content, hold)
        .filter("contaminated")
        .select("doc_id")
    )
    freq = spark.read.parquet(os.path.join(models, "text_models", "unigram"))
    totals = spark.read.parquet(
        os.path.join(models, "text_models", "unigram_totals")
    )
    lmk = lm_scores(content, freq=freq, totals=totals).filter("keep").select(
        "doc_id"
    )
    w = spark.read.parquet(os.path.join(models, "classifier", "weights"))
    ck = score_documents(content, w).filter("predicted").select("doc_id")
    passing = (
        content.join(q, "doc_id", "left_semi")
        .join(cont, "doc_id", "left_anti")
        .join(lmk, "doc_id", "left_semi")
        .join(ck, "doc_id", "left_semi")
        .orderBy("doc_id")
        .limit(6)
        .collect()
    )
    assert len(passing) == 6, "fixture needs 6 gate-passing corpus texts"
    texts = [r["text"] for r in passing]
    # strip the extraction artifacts back off: we need the ORIGINAL
    # corpus text to re-wrap in _html (content == extract(_html(t)))
    originals = {r["doc_id"]: r["text"] for r in cand}
    texts = [originals[r["doc_id"]] for r in passing]
    return {"models": models, "ann": ann, "texts": texts}


def _batch_ids():
    """Eight crawl doc_ids: distinct g = id % 17 (no URL-dedup
    collisions), no robots-blocked pages (site0 = g % 5 == 0 disallows
    all; site4 disallows /news/item-14), no torn witnesses
    (id % 89 != 0), ascending."""
    ids, seen = [], set()
    for i in range(2000, 2200):
        g = i % 17
        if g % 5 == 0 or g == 14 or i % 89 == 0 or g in seen:
            continue
        seen.add(g)
        ids.append(i)
        if len(ids) == 8:
            return ids
    raise AssertionError("id plan exhausted")


def _mk_warc_batch(spark, rows):
    from data_ingestion_api_system_loop_ai_spark.operators.warc import (
        build_warc_file,
    )

    return spark.createDataFrame(
        [(d, bytearray(build_warc_file(d, _html(t)))) for d, t in rows],
        "doc_id long, warc binary",
    )


def _plan(texts):
    """(batches, embeddings, expectations) — the planted corpus:
    b0: d0, d1 kept; b1: d2 = text copy of d0 (exact_dup), d3 fresh
    kept, d4 fresh text but d1's EMBEDDING (semantic_dup), d5 = text
    copy of d3 inside the batch (exact_dup, first-wins)."""
    ids = _batch_ids()
    d0, d1, d2, d3, d4, d5 = ids[:6]
    t0, t1, t3, t4 = texts[0], texts[1], texts[2], texts[3]
    b0 = [(d0, t0), (d1, t1)]
    b1 = [(d2, t0), (d3, t3), (d4, t4), (d5, t3)]
    emb = {
        d0: _vec(1), d1: _vec(2), d3: _vec(3),
        d4: _vec(2),  # d1's vector — the semantic plant
    }
    expect = {
        d0: "kept", d1: "kept", d2: "exact_dup", d3: "kept",
        d4: "semantic_dup", d5: "exact_dup",
    }
    return [b0, b1], emb, expect, (d0, d1, d2, d3, d4, d5)


def _emb_df(spark, emb):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(emb.items())],
        "vec_id long, embedding array<float>",
    )


def _rules(spark):
    from data_ingestion_api_system_loop_ai_spark.operators.robots import (
        parse_robots_rules,
        synthesize_robots,
    )

    return parse_robots_rules(synthesize_robots(spark))


def _run_cycle(spark, env, root, batches, emb, effect_hook=None,
               crash_expected=False):
    ann = os.path.join(root, "ann")
    if not os.path.isdir(ann):
        shutil.copytree(env["ann"], ann)
    rules = _rules(spark)
    embeddings = _emb_df(spark, emb)
    reports = {}
    crashed = False
    for i, rows in enumerate(batches):
        df = _mk_warc_batch(spark, rows)
        try:
            rep = ci.ingest_corpus_batch(
                spark, df, i, rules, embeddings, env["models"], ann,
                root, effect_hook=effect_hook,
            )
        except RuntimeError as exc:
            assert "injected crash" in str(exc)
            crashed = True
            rep = ci.ingest_corpus_batch(
                spark, df, i, rules, embeddings, env["models"], ann, root
            )
        reports[i] = sorted(map(tuple, rep.collect()))
    assert crashed == crash_expected
    return reports


def _snapshot(spark, root):
    curated = sorted(
        map(tuple, ci.read_curated_batches(spark, root).collect())
    )
    from data_ingestion_api_system_loop_ai_spark.sources.commit_protocol import (
        committed_units,
    )

    units = {
        store: committed_units(os.path.join(root, store))
        for store in (ci.CRAWL_IX, ci.DEDUP_IX)
    }
    units["curated"] = committed_units(os.path.join(root, ci.CURATED))
    units["ann"] = committed_units(os.path.join(root, "ann"))
    return curated, units


def test_ingest_corpus_batch_verdicts_and_curated_store(
    spark, day2_env, tmp_path
):
    batches, emb, expect, ids = _plan(day2_env["texts"])
    root = str(tmp_path / "root")
    reports = _run_cycle(spark, day2_env, root, batches, emb)
    got = {d: s for rep in reports.values() for d, s, _k in rep}
    for d, stage in expect.items():
        assert got[d] == stage, (d, got[d], stage)
    # curated store == the kept docs, with their page content
    curated = {r["doc_id"]: r for r in
               ci.read_curated_batches(spark, root).collect()}
    assert set(curated) == {d for d, s in expect.items() if s == "kept"}
    d0 = ids[0]
    assert day2_env["texts"][0].split()[0] in curated[d0]["content"]
    # the semantic plant matched d1's vector through the ANN advance
    from data_ingestion_api_system_loop_ai_spark.operators import (
        ann_index as ai,
    )

    appended = {
        r["vec_id"]
        for r in ai._read_units(spark, os.path.join(root, "ann"),
                                "assignments")
        .filter(F.col("vec_id") >= 2000)
        .collect()
    }
    kept_with_vecs = {d for d in appended}
    assert kept_with_vecs == {ids[0], ids[1], ids[3]}  # d0, d1, d3


def test_sequential_batches_equal_union_batch(spark, day2_env, tmp_path):
    """N doc_id-ordered batches through the cycle ≡ ONE batch over the
    union: identical curated rows and identical per-doc attribution
    (cross-batch first-wins == in-batch first-wins under ordered
    arrival — the documented order-effects clause)."""
    batches, emb, _expect, _ids = _plan(day2_env["texts"])
    root_seq = str(tmp_path / "seq")
    rep_seq = _run_cycle(spark, day2_env, root_seq, batches, emb)
    root_uni = str(tmp_path / "uni")
    union = [batches[0] + batches[1]]
    rep_uni = _run_cycle(spark, day2_env, root_uni, union, emb)
    seq_rows = sorted(r for rep in rep_seq.values() for r in rep)
    uni_rows = sorted(r for rep in rep_uni.values() for r in rep)
    assert seq_rows == uni_rows
    cur_seq = sorted(
        map(tuple, ci.read_curated_batches(spark, root_seq).collect())
    )
    cur_uni = sorted(
        map(tuple, ci.read_curated_batches(spark, root_uni).collect())
    )
    assert cur_seq == cur_uni and len(cur_seq) > 0


def test_ingest_crash_matrix_replay_converges(spark, day2_env, tmp_path):
    """Kill after every durable effect of batch 1 — the crawl stage's
    internal seams AND every stage boundary — replay the same batch
    id, and pin the final state (curated rows, committed units of
    every store, the replayed report) to the never-crashed golden."""
    batches, emb, _expect, _ids = _plan(day2_env["texts"])
    golden_root = str(tmp_path / "golden")
    golden_rep = _run_cycle(spark, day2_env, golden_root, batches, emb)
    golden = _snapshot(spark, golden_root)
    assert len(golden[0]) > 0

    # the crawl stage's INTERNAL seams (kept_written / canon_written)
    # are already matrix-killed in test_crawl_funnel.py over the same
    # primitive; this matrix covers the five seams the COMPOSITION
    # added (the full 7-seam run was green once while building — 20
    # min — and the two crawl seams re-prove nothing new here)
    seams = (
        "crawl_committed",
        "dedup_out_written", "dedup_committed", "embed_committed",
        "curated_written",
    )
    for seam in seams:
        def hook(s, batch_id, _seam=seam):
            if s == _seam and batch_id == 1:
                raise RuntimeError(f"injected crash after {s}")

        root = str(tmp_path / f"crash_{seam}")
        rep = _run_cycle(
            spark, day2_env, root, batches, emb, effect_hook=hook,
            crash_expected=True,
        )
        assert _snapshot(spark, root) == golden, seam
        assert rep[1] == golden_rep[1], seam

    # full-publish replay: running batch 1 again is convergent (stable
    # verdicts, no double-append anywhere)
    rules = _rules(spark)
    again = ci.ingest_corpus_batch(
        spark, _mk_warc_batch(spark, batches[1]), 1, rules,
        _emb_df(spark, emb), day2_env["models"],
        os.path.join(golden_root, "ann"), golden_root,
    )
    assert sorted(map(tuple, again.collect())) == golden_rep[1]
    assert _snapshot(spark, golden_root) == golden
