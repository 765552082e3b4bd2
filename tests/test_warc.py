"""WARC record framing (B122, ``operators/warc.py``).

Hand-packed byte goldens independent of the synthesizer, spec
round-trip, torn/garbage arms, and the composed pipeline's
driver-grade DuckDB parity (WARC bytes -> response body -> B121
extraction == B121's oracle minus the torn documents).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.html_extract import (
    q_html_extract,
)
from data_ingestion_api_system_loop_ai_spark.operators.warc import (
    TORN_MOD,
    WARC_PIPELINE_ORACLE,
    build_warc_file,
    parse_warc,
    q_warc_extract,
    q_warc_pipeline,
)

from .oracle_utils import compare, duckdb_con


# ------------------------------------------------- hand-packed goldens

def test_parse_warc_hand_packed_golden():
    # framed by hand with a hard-coded Content-Length — independent of
    # build_warc_file. Payload: 17 + 25 + 2 + 15 = 59 bytes.
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: http://e.com/1\r\n"
        b"Content-Length: 59\r\n"
        b"\r\n"
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"\r\n"
        b"<p>hi there</p>"
        b"\r\n\r\n"
    )
    recs = parse_warc(raw)
    assert len(recs) == 1
    r = recs[0]
    assert r["error"] is None
    assert r["warc_type"] == "response"
    assert r["record_id"] == "<urn:uuid:1>"
    assert r["target_uri"] == "http://e.com/1"
    assert r["content_length"] == 59
    assert r["http_status"] == 200
    assert r["body"] == "<p>hi there</p>"


def test_parse_warc_framing_is_length_driven_not_sentinel_scan():
    # the body legally contains the bytes "WARC/1.0\r\n" — a sentinel
    # scanner would split here; the Content-Length walk must not
    body = b"leading WARC/1.0\r\ntrailing"
    payload = b"HTTP/1.1 200 OK\r\n\r\n" + body
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )
    recs = parse_warc(raw)
    assert len(recs) == 1
    assert recs[0]["error"] is None
    assert recs[0]["body"] == body.decode()


def test_parse_warc_two_records_and_salvage():
    ok = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 4\r\n\r\n"
        b"abcd"
        b"\r\n\r\n"
    )
    torn = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"Content-Length: 1000\r\n\r\n"
        b"only a few bytes"
    )
    recs = parse_warc(ok + torn)
    assert len(recs) == 2
    assert recs[0]["error"] is None and recs[0]["warc_type"] == "warcinfo"
    assert recs[1]["error"] is not None
    assert "truncated" in recs[1]["error"]


def test_parse_warc_garbage_arms():
    assert "version" in parse_warc(b"HTTP/1.1 200\r\n\r\n")[0]["error"]
    assert "colon" in parse_warc(
        b"WARC/1.0\r\nno colon here\r\n\r\n"
    )[0]["error"]
    assert "Content-Length" in parse_warc(
        b"WARC/1.0\r\nWARC-Type: request\r\n\r\n"
    )[0]["error"]
    # payload present but the 4-byte separator is not
    assert "separator" in parse_warc(
        b"WARC/1.0\r\nContent-Length: 2\r\n\r\nabXX"
    )[0]["error"]
    # bad HTTP status line inside a response record
    bad = b"NOT-HTTP nothing"
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"Content-Length: {len(bad)}\r\n\r\n".encode()
        + bad + b"\r\n\r\n"
    )
    assert "status line" in parse_warc(raw)[0]["error"]


# ------------------------------------------------------- round-trip

def test_build_parse_round_trip():
    html = "<html><body><p>round trip é中</p></body></html>"
    recs = parse_warc(build_warc_file(42, html))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
    assert all(r["error"] is None for r in recs)
    info, req, resp = recs
    assert info["target_uri"] is None
    assert req["target_uri"] == resp["target_uri"]
    # the URI carries the FULL g = doc_id % 17 identity of
    # urls.synthesize_urls (ADVICE r11 #4): g=8 → scheme http (even),
    # site g%5=3, no :8080 (g%7=1), id/section query (section g%3=2)
    assert (
        resp["target_uri"]
        == "http://site3.example.com/news/item-8?id=8&section=2"
    )
    assert resp["http_status"] == 200
    assert resp["body"] == html  # byte-identical through utf-8 framing
    # Content-Length counts BYTES of the multibyte body, not chars
    assert resp["content_length"] > len(html)


def test_warc_uri_canonical_group_equals_synthesized_url(spark):
    """ADVICE r11 #4 pinned: the WARC Target-URI and the synthesized
    messy URL canonicalize into the SAME canonical group for every
    doc_id across two full g-cycles — so a funnel that swaps its URL
    source between the two sees identical robots/dedup verdicts."""
    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        canonicalize_urls,
        synthesize_urls,
    )

    rows = []
    for doc_id in range(0, 34):
        recs = parse_warc(build_warc_file(doc_id, "<p>x</p>"))
        uri = [r for r in recs if r["warc_type"] == "response"][0][
            "target_uri"
        ]
        rows.append((doc_id, uri))
    warc_urls = spark.createDataFrame(rows, "doc_id long, url string")
    syn = synthesize_urls(spark.range(34).withColumnRenamed("id", "doc_id"))
    cw = canonicalize_urls(warc_urls).select(
        "doc_id", F.col("canonical_url").alias("cw")
    )
    cs = canonicalize_urls(syn).select(
        "doc_id", F.col("canonical_url").alias("cs")
    )
    joined = cw.join(cs, "doc_id").collect()
    assert len(joined) == 34
    assert all(r["cw"] == r["cs"] for r in joined)


# ----------------------------------------------------- engine surface

def test_warc_extract_record_table(spark, sf_dir):
    rows = q_warc_extract(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for did, recs in by_doc.items():
        recs.sort(key=lambda r: r["rec_no"])
        if did % TORN_MOD == 0:
            assert recs[-1]["error"] is not None
            assert all(r["error"] is None for r in recs[:-1])
        else:
            assert [r["warc_type"] for r in recs] == [
                "warcinfo", "request", "response",
            ]
            assert all(r["error"] is None for r in recs)
            assert recs[2]["http_status"] == 200
            assert recs[2]["body_chars"] > 0
    # the torn arm exists at every SF (doc_id 0 is always present)
    assert any(did % TORN_MOD == 0 for did in by_doc)


def test_warc_pipeline_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(q_warc_pipeline(spark, sf_dir), con, WARC_PIPELINE_ORACLE)
    finally:
        con.close()


def test_warc_pipeline_pins_to_html_extract(spark, sf_dir):
    # the WARC stage is a byte-identical carrier: the composed pipeline
    # equals B121 on every non-torn document
    via_warc = {
        r["doc_id"]: tuple(r)
        for r in q_warc_pipeline(spark, sf_dir).collect()
    }
    direct = {
        r["doc_id"]: tuple(r)
        for r in q_html_extract(spark, sf_dir).collect()
        if r["doc_id"] % TORN_MOD != 0
    }
    assert via_warc == direct


def test_parse_warc_bad_http_payload_does_not_abort_walk():
    # record 1: correctly FRAMED response with a garbage HTTP payload
    # -> record-level error; record 2 still parses (salvage discipline)
    bad = b"NOT-HTTP nothing"
    r1 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"Content-Length: {len(bad)}\r\n\r\n".encode()
        + bad + b"\r\n\r\n"
    )
    r2 = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    recs = parse_warc(r1 + r2)
    assert len(recs) == 2
    assert recs[0]["warc_type"] == "response"
    assert "status line" in recs[0]["error"]
    assert recs[1]["warc_type"] == "warcinfo" and recs[1]["error"] is None


def test_parse_warc_rejects_non_digit_content_length():
    # int() would accept all of these; the digits-only gate must not.
    # (' 59' is NOT here: header values are whitespace-stripped per the
    # header grammar before validation, so it is legal.)
    for cl in (b"-4", b"+59", b"5_9"):
        raw = (
            b"WARC/1.0\r\nWARC-Type: request\r\n"
            b"Content-Length: " + cl + b"\r\n\r\nabcd\r\n\r\n"
        )
        recs = parse_warc(raw)
        assert recs[0]["error"] is not None and "Content-Length" in recs[0]["error"], cl
