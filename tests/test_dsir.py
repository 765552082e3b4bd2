"""DSIR importance-resampling selection (``operators/dsir.py``,
Xie et al. 2023) — registered in the round-8 rotation (slot funded by
q_dedup_spans). Pins, beyond the driver's hash gate:

- driver-grade DuckDB parity at the test SF (the same comparison the
  driver runs at sf0.01);
- the in-row SORT + RUN-LENGTH tf shape against hand-counted feature
  multisets (repeats, bigram multiplicity, single-token and token-less
  documents — the shapes the run-start/sentinel arithmetic can get
  wrong);
- the selection semantics: exactly ``floor(n_raw / SELECT_FRAC_INV)``
  selected, ranked by (log_iw DESC, doc_id), with the eval-holdout
  target slice never a candidate and token-less documents excluded.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.operators import dsir
from data_ingestion_api_system_loop_ai_spark.operators.contamination import (
    EVAL_MOD,
    EVAL_REM,
)

from .oracle_utils import compare, duckdb_con


def test_dsir_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(
            dsir.q_dsir_select(spark, sf_dir), con, dsir.DSIR_ORACLE
        )
    finally:
        con.close()


def test_feature_tfs_run_length_matches_hand_counts(spark):
    """'a b a b c' -> unigrams {a:2, b:2, c:1} + bigrams
    {'a b':2, 'b a':1, 'b c':1} (WITH multiplicity); a single-token doc
    has one unigram and no bigrams; a token-less doc contributes no
    rows at all (and a punctuation-only doc tokenizes to empty)."""
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "solo"), (3, ""), (4, "?!.")],
        "doc_id long, text string",
    )
    rows = dsir._feature_tfs(docs).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["feature"]] = r["tf"]
    assert by_doc[1] == {
        "a": 2, "b": 2, "c": 1, "a b": 2, "b a": 1, "b c": 1,
    }
    assert by_doc[2] == {"solo": 1}
    assert 3 not in by_doc and 4 not in by_doc
    # every emitted feature list is sorted-distinct per doc (run starts
    # of a sorted array): no duplicate (doc, feature) rows
    assert len(rows) == sum(len(v) for v in by_doc.values())


def test_dsir_selection_semantics(spark, sf_dir):
    out = dsir.q_dsir_select(spark, sf_dir)
    rows = out.collect()
    n_raw = len(rows)
    k = n_raw // dsir.SELECT_FRAC_INV
    assert sum(r["selected"] for r in rows) == k
    # rank order is (log_iw DESC, doc_id): re-sorting reproduces
    # sel_rank exactly, and selection is exactly ranks 1..k
    resorted = sorted(rows, key=lambda r: (-r["log_iw"], r["doc_id"]))
    assert [r["sel_rank"] for r in resorted] == list(range(1, n_raw + 1))
    assert all(r["selected"] == (r["sel_rank"] <= k) for r in rows)
    # the target (eval-holdout) slice is the distribution sample, not a
    # candidate: none of its docs appear
    assert all(r["doc_id"] % EVAL_MOD != EVAL_REM for r in rows)


def test_dsir_excludes_tokenless_docs_and_weights_targetlike_up(spark):
    """Constructed corpus: raw docs that share vocabulary with the
    target slice must outrank raw docs that don't; a token-less raw doc
    is not a candidate."""
    target_id = EVAL_REM  # doc_id % EVAL_MOD == EVAL_REM
    docs = [
        (target_id, "alpha beta alpha beta gamma"),  # target sample
        (1, "alpha beta gamma alpha"),  # looks like the target
        (2, "zeta eta theta iota"),     # looks nothing like it
        (3, "..."),                     # token-less: excluded
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in dsir.q_dsir_select(spark, tmp).collect()
        }
    assert set(out) == {1, 2}
    assert out[1]["log_iw"] > out[2]["log_iw"]
    assert out[1]["sel_rank"] == 1 and out[2]["sel_rank"] == 2


def test_dsir_log_iw_fold_is_partitioning_invariant(spark, sf_dir):
    """The per-doc contribution fold is feature-sorted, so the rounded
    weight must be identical under a different partitioning of the
    input (the cross-engine / cross-cluster determinism claim)."""
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = {
        r["doc_id"]: r["log_iw"]
        for r in dsir.dsir_weights(docs).collect()
    }
    b = {
        r["doc_id"]: r["log_iw"]
        for r in dsir.dsir_weights(docs.repartition(13, "text")).collect()
    }
    assert a == b


def test_dsir_from_model_bit_identical_and_batch_form(spark, sf_dir, tmp_path):
    """The frozen bucket store reproduces the inline selection
    row-for-row (same corpus), and the batch probe's weights equal the
    full-pool weights for the same docs — the model, not the candidate
    set, determines log_iw — with a dense within-batch rank."""
    root = str(tmp_path / "dsir_model")
    dsir.build_dsir_model(spark, sf_dir, root)
    inline = sorted(map(tuple, dsir.q_dsir_select(spark, sf_dir).collect()))
    frozen = sorted(
        map(tuple, dsir.q_dsir_from_model(spark, sf_dir, root).collect())
    )
    assert inline == frozen and len(inline) > 0

    by_doc = {t[0]: t[1] for t in inline}  # doc_id -> log_iw
    batch = dsir.q_dsir_batch_from_model(spark, sf_dir, root).collect()
    assert 0 < len(batch) < len(inline)
    assert all(r["doc_id"] % 100 == 0 for r in batch)
    for r in batch:
        assert by_doc[r["doc_id"]] == r["log_iw"], r["doc_id"]
    ranks = sorted(r["sel_rank"] for r in batch)
    assert ranks == list(range(1, len(batch) + 1))
    assert (
        sum(r["selected"] for r in batch)
        == len(batch) // dsir.SELECT_FRAC_INV
    )


def test_dsir_model_refuses_torn_build(spark, sf_dir, tmp_path):
    """No marker -> the probe refuses (commit protocol)."""
    import os

    import pytest

    root = str(tmp_path / "torn")
    os.makedirs(root, exist_ok=True)
    with pytest.raises(Exception, match="build_dsir_model"):
        dsir.q_dsir_from_model(spark, sf_dir, root)
