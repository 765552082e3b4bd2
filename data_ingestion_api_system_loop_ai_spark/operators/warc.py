"""WARC record framing: parse + extract pipeline — B122.

The Web ARChive format (ISO 28500; the Common Crawl container — every
web-scale corpus's first input byte is a WARC file) frames records as

    WARC/1.0\\r\\n
    <name>: <value>\\r\\n ...          (WARC-Type, WARC-Record-ID,
    Content-Length: <n>\\r\\n           WARC-Date, WARC-Target-URI...)
    \\r\\n
    <n payload bytes>
    \\r\\n\\r\\n                          (record separator)

The defining property is CONTENT-LENGTH-DRIVEN framing: a reader never
scans payload bytes for a sentinel (HTML bodies legally contain
anything, including the bytes "WARC/1.0"), it jumps exactly
Content-Length forward — which is also what makes the format safely
splittable for distributed processing. ``parse_warc`` implements that
walk strictly (version line pinned to WARC/1.0, header lines must
carry a colon, Content-Length mandatory and honored exactly, the
4-byte separator verified), salvaging a torn file into the records
that framed correctly plus one error row — a 1 GB WARC with one torn
record keeps its good records, mirroring q_media_meta's error-row
discipline.

Engine shape (same two-stage mapInPandas chain as q_media_meta):
executor-side synthesis builds one WARC file per document — warcinfo +
request + response, the response body being the SAME page
``html_extract.synthesize_pages`` emits for B121 — then a second
Arrow pass walks the framing. Payload bytes never visit the driver and
never exist in SQL, so ``q_warc_extract`` is direct-tested
(hand-packed byte goldens independent of the synthesizer, spec
round-trip, torn/garbage arms); the COMPOSED ``q_warc_pipeline``
(WARC bytes -> response body -> B121 boilerplate removal) closes the
loop back to SQL: because the body round-trips byte-identically, its
oracle is B121's full-pipeline DuckDB oracle restricted to the
non-torn documents — driver-grade parity THROUGH the byte framing.

Reference parity: none (no file formats in the 412-LoC reference);
BASELINE.json north-star tier ("multimodal/ingestion" at 100 TB).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table
from .html_extract import (
    HTML_EXTRACT_ORACLE,
    extract_main_content,
    synthesize_pages,
)

CRLF = b"\r\n"
SEP = b"\r\n\r\n"
VERSION = b"WARC/1.0"

# every 97th document's WARC file is torn mid-response (same residue
# convention as q_media_meta's torn containers)
TORN_MOD = 97


# ---------------------------------------------------------------- build

def _warc_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = VERSION + CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode() + CRLF
    head += f"Content-Length: {len(payload)}".encode() + CRLF + CRLF
    return head + payload + SEP


def _record_id(doc_id: int, slot: int) -> str:
    # deterministic urn:uuid (no uuid4/now — the driver compare and the
    # goldens need byte-stable files)
    return f"<urn:uuid:00000000-0000-4000-8000-{doc_id:08d}{slot:04d}>"


def _warc_date(doc_id: int) -> str:
    return f"2026-01-{doc_id % 28 + 1:02d}T00:00:00Z"


def build_warc_file(doc_id: int, html: str) -> bytes:
    """One WARC file: warcinfo + request + response (body = the B121
    page), framed per ISO 28500.

    The WARC-Target-URI carries the FULL ``g = doc_id % 17`` page
    identity of ``urls.synthesize_urls`` (ADVICE r11 #4 — r10's fix
    shared only the site/item path): scheme (https for odd g), the
    canonical-affecting :8080 port (g % 7 = 0), and the id/section
    query, so the two URLs canonicalize into the SAME group and the
    batch funnel's robots/dedup verdicts stay page-equal if it ever
    switches to taking its URL from the response record. The WARC
    form is the CLEAN canonical spelling (a crawler records the URL
    it actually fetched); the synthesized form adds the case/slash/
    tracking mess the canonicalizer strips."""
    g = doc_id % 17
    scheme = "https" if g % 2 else "http"
    port = ":8080" if g % 7 == 0 else ""
    path_q = f"/news/item-{g}?id={g}&section={g % 3}"
    uri = f"{scheme}://site{g % 5}.example.com{port}{path_q}"
    date = _warc_date(doc_id)
    info_payload = (
        b"software: data-ingestion-spark/0.1\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    info = _warc_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", _record_id(doc_id, 0)),
            ("WARC-Date", date),
            ("Content-Type", "application/warc-fields"),
        ],
        info_payload,
    )
    req_payload = (
        f"GET {path_q} HTTP/1.1\r\n"
        f"Host: site{g % 5}.example.com{port}\r\n"
        "User-Agent: data-ingestion-bot/0.1\r\n\r\n"
    ).encode()
    req = _warc_record(
        [
            ("WARC-Type", "request"),
            ("WARC-Record-ID", _record_id(doc_id, 1)),
            ("WARC-Date", date),
            ("WARC-Target-URI", uri),
            ("Content-Type", "application/http;msgtype=request"),
        ],
        req_payload,
    )
    body = html.encode("utf-8")
    resp_payload = (
        (
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        + body
    )
    resp = _warc_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", _record_id(doc_id, 2)),
            ("WARC-Date", date),
            ("WARC-Target-URI", uri),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        resp_payload,
    )
    return info + req + resp


def _synthesize_warc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = []
        for did, html in zip(pdf["doc_id"], pdf["html"]):
            p = build_warc_file(int(did), html)
            if did % TORN_MOD == 0:
                p = p[: max(len(p) - len(p) // 4, 8)]
            payloads.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "warc": payloads})


def warc_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, warc binary): one synthesized WARC file per document,
    every ``TORN_MOD``-th torn mid-response."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return synthesize_pages(docs).mapInPandas(
        _synthesize_warc, "doc_id long, warc binary"
    )


# ---------------------------------------------------------------- parse

def parse_warc(payload: bytes) -> list[dict]:
    """Strict Content-Length-driven record walk. Returns one dict per
    record; a malformed tail is salvaged as a final dict with
    ``error`` set (records that framed correctly before the tear are
    kept — the 1-GB-WARC-one-torn-record case)."""
    records: list[dict] = []
    off = 0
    rec_no = 0
    while off < len(payload):
        try:
            records.append(_parse_record(payload, off, rec_no))
            off = records[-1].pop("_next")
        except ValueError as exc:
            records.append(
                {
                    "rec_no": rec_no,
                    "warc_type": None,
                    "record_id": None,
                    "target_uri": None,
                    "content_length": None,
                    "http_status": None,
                    "body": None,
                    "error": str(exc),
                }
            )
            break
        rec_no += 1
    return records


def _line_end(payload: bytes, off: int) -> int:
    e = payload.find(CRLF, off)
    if e < 0:
        raise ValueError("torn WARC header (no CRLF)")
    return e


def _parse_record(payload: bytes, off: int, rec_no: int) -> dict:
    e = _line_end(payload, off)
    version = payload[off:e]
    if version != VERSION:
        raise ValueError(f"bad WARC version line: {version[:32]!r}")
    off = e + 2
    headers: dict[str, str] = {}
    while True:
        e = _line_end(payload, off)
        line = payload[off:e]
        off = e + 2
        if line == b"":
            break
        if b":" not in line:
            raise ValueError(f"WARC header without colon: {line[:32]!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().decode("ascii")] = v.strip().decode("ascii")
    if "Content-Length" not in headers:
        raise ValueError("WARC record missing Content-Length")
    # strict digits-only: int() would accept '-4' (which slices an
    # empty block, matches the header's own CRLFCRLF as the separator
    # and resumes the walk at a WRONG offset), '+59', ' 59 ', '5_9'
    if not headers["Content-Length"].isdigit():
        raise ValueError(
            f"bad Content-Length: {headers['Content-Length'][:32]!r}"
        )
    clen = int(headers["Content-Length"])
    block = payload[off: off + clen]
    if len(block) < clen:
        raise ValueError("torn WARC record (payload truncated)")
    if payload[off + clen: off + clen + 4] != SEP:
        raise ValueError("missing WARC record separator")
    rec: dict = {
        "rec_no": rec_no,
        "warc_type": headers.get("WARC-Type"),
        "record_id": headers.get("WARC-Record-ID"),
        "target_uri": headers.get("WARC-Target-URI"),
        "content_length": clen,
        "http_status": None,
        "body": None,
        "error": None,
        "_next": off + clen + 4,
    }
    if rec["warc_type"] == "response":
        # a bad HTTP payload inside a CORRECTLY FRAMED record is a
        # record-level error, not a walk-level one: the framing gave us
        # _next, so later records still parse (the salvage discipline —
        # only a framing failure aborts the walk)
        try:
            status, body = _parse_http_response(block)
            rec["http_status"] = status
            rec["body"] = body
        except ValueError as exc:
            rec["error"] = str(exc)
    return rec


def _parse_http_response(block: bytes) -> tuple[int, str]:
    e = block.find(CRLF)
    if e < 0:
        raise ValueError("torn HTTP response (no status line)")
    parts = block[:e].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP status line: {block[:e][:32]!r}")
    status = int(parts[1])
    h_end = block.find(SEP)
    if h_end < 0:
        raise ValueError("torn HTTP response (no header terminator)")
    return status, block[h_end + 4:].decode("utf-8")


_REC_SCHEMA = (
    "doc_id long, rec_no int, warc_type string, record_id string, "
    "target_uri string, content_length long, http_status int, "
    "body string, error string"
)


def _parse_warc_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "doc_id", "rec_no", "warc_type", "record_id", "target_uri",
        "content_length", "http_status", "body", "error",
    ]
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            for rec in parse_warc(bytes(r.warc)):
                rec["doc_id"] = r.doc_id
                rows.append(rec)
        out = pd.DataFrame(rows, columns=cols)
        # a batch whose rows are all-None in an int column must not let
        # pandas coerce to float64 (the B120 lesson): nullable dtypes
        out["rec_no"] = out["rec_no"].astype("Int32")
        out["content_length"] = out["content_length"].astype("Int64")
        out["http_status"] = out["http_status"].astype("Int32")
        yield out


def warc_records(files: DataFrame) -> DataFrame:
    """Every record of every WARC file in ``files`` (doc_id, warc)."""
    return files.mapInPandas(_parse_warc_batch, _REC_SCHEMA)


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rec_no, warc_type, record_id, target_uri,
    content_length, http_status, body_chars, error): the record table
    of the synthesized WARC corpus — what a 100 TB crawl ingest reads
    first. (Unregistered — payload bytes never exist in SQL;
    hand-packed goldens + round-trip + torn arms in
    tests/test_warc.py.)"""
    return warc_records(warc_files(spark, sf_dir)).select(
        "doc_id", "rec_no", "warc_type", "record_id", "target_uri",
        "content_length", "http_status",
        F.length("body").alias("body_chars"), "error",
    )


def q_warc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC bytes -> HTTP response body -> B121 boilerplate removal,
    end to end. The response body round-trips byte-identically through
    the framing, so this equals ``q_html_extract`` restricted to the
    non-torn documents — which is exactly the DuckDB oracle
    (``WARC_PIPELINE_ORACLE``): driver-grade parity THROUGH the
    byte-level stage. (Unregistered — 50-slot cap.)"""
    recs = warc_records(warc_files(spark, sf_dir))
    pages = recs.filter(
        (F.col("warc_type") == "response") & F.col("error").isNull()
    ).select("doc_id", F.col("body").alias("html"))
    return extract_main_content(pages)


WARC_PIPELINE_ORACLE = f"""
SELECT * FROM ({HTML_EXTRACT_ORACLE})
WHERE doc_id % {TORN_MOD} <> 0
"""


UNREGISTERED_WARC_QUERIES = {
    "q_warc_extract": q_warc_extract,
    "q_warc_pipeline": q_warc_pipeline,
}
UNREGISTERED_WARC_ORACLES = {"q_warc_pipeline": WARC_PIPELINE_ORACLE}
