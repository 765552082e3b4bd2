"""Crawl-ingest funnel capstone (B125, ``operators/crawl_funnel.py``).

Composed-oracle parity (per-doc verdicts and the drop-attribution
report), partition-of-corpus invariant, precedence goldens on a
constructed corpus that fires EVERY arm (torn / blocked / thin /
url_dup / kept), and determinism.
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.crawl_funnel import (
    CRAWL_FUNNEL_ORACLE,
    CRAWL_FUNNEL_REPORT_ORACLE,
    MIN_CONTENT_CHARS,
    q_crawl_funnel,
    q_crawl_funnel_report,
)
from data_ingestion_api_system_loop_ai_spark.operators.warc import TORN_MOD

from .oracle_utils import compare, duckdb_con


def test_crawl_funnel_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(q_crawl_funnel(spark, sf_dir), con, CRAWL_FUNNEL_ORACLE)
        compare(
            q_crawl_funnel_report(spark, sf_dir),
            con,
            CRAWL_FUNNEL_REPORT_ORACLE,
        )
    finally:
        con.close()


def test_crawl_funnel_partitions_the_corpus(spark, sf_dir):
    rows = q_crawl_funnel(spark, sf_dir).collect()
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    for r in rows:
        # verdict is the FIRST gate in pipeline order
        if not r["fetched"]:
            assert r["verdict"] == "torn"
            assert r["content_chars"] is None
        elif not r["allowed"]:
            assert r["verdict"] == "blocked"
        elif (r["content_chars"] or 0) < MIN_CONTENT_CHARS:
            assert r["verdict"] == "thin"
        elif not r["keep_url"]:
            assert r["verdict"] == "url_dup"
        else:
            assert r["verdict"] == "kept"


def _mini_sf_dir(tmp_path) -> str:
    """A constructed documents table that fires every funnel arm.

    doc_id 0      -> torn   (0 % TORN_MOD == 0)
    doc_id 85     -> blocked (85 % 17 == 0 -> site 0, Disallow: /)
    doc_id 18     -> thin    (18 % 17 == 1 -> site 1 allow-all; tiny
                              text, first of its URL group)
    doc_id 35, 52 -> same identity g=1 as 18 (35%17=1, 52%17=1): both
                     land on 18's canonical URL -> url_dup (they carry
                     long text, but 18 wins the URL by min doc_id, so
                     they fall at the LATER dedup gate only if they
                     pass the thin gate)
    doc_id 2      -> kept   (site 2, allowed, long text, unique URL)
    """
    long_text = "word " * 40  # 200 chars of kept content
    rows = {
        0: long_text,
        85: long_text,
        18: "tiny text",
        35: long_text,
        52: long_text,
        2: long_text,
    }
    d = str(tmp_path)
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(rows), type=pa.int64()),
            "text": pa.array(
                [rows[k].strip() for k in sorted(rows)], type=pa.string()
            ),
            "lang": pa.array(["en"] * len(rows), type=pa.string()),
            "source": pa.array(["test"] * len(rows), type=pa.string()),
            "n_chars": pa.array(
                [len(rows[k].strip()) for k in sorted(rows)], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


def test_crawl_funnel_every_arm_fires(spark, tmp_path):
    sf = _mini_sf_dir(tmp_path)
    out = {r["doc_id"]: r for r in q_crawl_funnel(spark, sf).collect()}
    assert out[0]["verdict"] == "torn"
    assert out[85]["verdict"] == "blocked"
    assert out[18]["verdict"] == "thin"
    # 18 holds the canonical URL (min doc_id of group g=1), so the
    # long-text twins 35/52 pass the thin gate and fall at dedup
    assert out[35]["verdict"] == "url_dup"
    assert out[52]["verdict"] == "url_dup"
    assert out[2]["verdict"] == "kept"
    # parity holds on the constructed corpus too (only the documents
    # view exists in the mini dir — the funnel reads nothing else)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf, 'documents.parquet')}'"
    )
    try:
        compare(q_crawl_funnel(spark, sf), con, CRAWL_FUNNEL_ORACLE)
    finally:
        con.close()


def test_crawl_funnel_report_sums_to_corpus(spark, sf_dir):
    rep = {
        r["verdict"]: r["n_docs"]
        for r in q_crawl_funnel_report(spark, sf_dir).collect()
    }
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    assert sum(rep.values()) == load_table(spark, sf_dir, "documents").count()
    # the planted synthesis guarantees every structural bucket exists
    for v in ("torn", "blocked", "url_dup", "kept"):
        assert rep.get(v, 0) > 0, v
    assert 0 % TORN_MOD == 0  # doc 0 is always the torn witness


def test_crawl_funnel_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_crawl_funnel(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_crawl_funnel(spark, sf_dir).collect()))
    assert a == b
