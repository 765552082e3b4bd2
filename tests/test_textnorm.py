"""Unicode text normalization (B128, ``operators/textnorm.py``).

Driver-grade DuckDB parity over the WHOLE pipeline (mess synthesis
shared verbatim), per-rule golden strings, the idempotence pin
(normalize of normalize == normalize), and determinism. All non-ASCII
characters are spelled as explicit escapes so the fixtures are
unambiguous in source.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.textnorm import (
    TEXT_NORMALIZE_ORACLE,
    normalize_text,
    q_text_normalize,
)

from .oracle_utils import compare, duckdb_con


def test_text_normalize_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(q_text_normalize(spark, sf_dir), con, TEXT_NORMALIZE_ORACLE)
    finally:
        con.close()


GOLDENS = [
    # NBSP -> space; curly quotes -> ascii
    (
        "a\u00a0b \u2018c\u2019 \u201cd\u201d",
        "a b 'c' \"d\"",
    ),
    # zero-widths deleted INSIDE a word (the dedup poison)
    (
        "zero\u200bwidth\u200cjoin\u200der\ufeff",
        "zerowidthjoiner",
    ),
    # dashes unified, ellipsis expanded
    ("a\u2013b\u2014c\u2026", "a-b-c..."),
    # C0 controls DELETED (not spaced), CRLF -> LF, tabs -> space,
    # runs collapsed
    ("a\x07b\r\nc\td   e", "ab\nc d e"),
    # 3+ newlines -> paragraph break; trim
    ("  x\n\n\n\n\ny  ", "x\n\ny"),
    # already-clean text is untouched
    ("plain ascii text.", "plain ascii text."),
]


def test_normalize_goldens(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _w) in enumerate(GOLDENS)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text_norm"] for r in normalize_text(df).collect()
    }
    for i, (_raw, want) in enumerate(GOLDENS):
        assert got[i] == want, f"golden {i}: {got[i]!r} != {want!r}"


def test_normalize_idempotent(spark, sf_dir):
    from pyspark.sql import functions as F

    once = q_text_normalize(spark, sf_dir).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    twice = normalize_text(once).select("doc_id", "text_norm", "text")
    assert twice.filter(F.col("text_norm") != F.col("text")).count() == 0


def test_normalize_arms_fire(spark, sf_dir):
    rows = q_text_normalize(spark, sf_dir).collect()
    # residue docs carry planted mess, so normalization shrinks them
    assert any(
        r["n_after"] < r["n_before"] for r in rows if r["doc_id"] % 5 == 0
    )
    assert any(
        r["n_after"] < r["n_before"] for r in rows if r["doc_id"] % 4 == 0
    )
    # no normalized text retains any planted marker
    bad_chars = (
        "\u00a0", "\u200b", "\u2018", "\u201c", "\u2014", "\u2026",
        "\r", "\x07", "  ",
    )
    for r in rows:
        t = r["text_norm"]
        for bad in bad_chars:
            assert bad not in t, (r["doc_id"], repr(bad))


def test_normalize_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_text_normalize(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_text_normalize(spark, sf_dir).collect()))
    assert a == b
