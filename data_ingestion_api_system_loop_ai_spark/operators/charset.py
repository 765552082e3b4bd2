"""Charset sniffing + decode — B126.

Between WARC framing (B122) and HTML extraction (B121) every crawl
pipeline answers "what encoding are these bytes?": HTTP headers lie
often enough that C4/CCNet-class pipelines sniff (the chardet/ftfy
layer). The engine implements the DETERMINISTIC core of that layer —
the part that is a function of the bytes alone:

1. BOM detection (the WHATWG encoding-sniffing first step):
   ``EF BB BF`` -> utf-8, ``FF FE`` -> utf-16le, ``FE FF`` -> utf-16be
   (BOM wins unconditionally; it is an explicit in-band declaration);
2. otherwise a STRICT UTF-8 validation walk (RFC 3629 table: exact
   continuation-byte counts, no overlongs above the structural check,
   surrogates and >U+10FFFF rejected by range) — valid + any
   multibyte sequence -> utf-8; valid + pure 7-bit -> ascii;
3. otherwise latin-1 (decodes any byte string; the crawl-pipeline
   fallback — every byte maps to a codepoint, so nothing is lost and
   mojibake is quantified instead of crashing).

No statistical language models (chardet's frequency tables are a
model artifact, not a byte property); the sniff is exact, so its
tests are goldens, not tolerances.

Engine shape: the q_media_meta discipline — executor-side synthesis
(documents text re-encoded per-residue into utf-8 / BOM'd utf-8 /
utf-16le / utf-16be / latin-1 / ascii, every 89th payload torn inside
a multibyte sequence), one Arrow pass of pure byte math, error rows
never kill the job. Payload bytes never exist in SQL -> unregistered,
direct-tested (hand-packed goldens incl. overlong/surrogate/
truncation cases, per-arm round-trip, torn arm).

Reference parity: none; BASELINE.json north-star tier ("text
pipeline ingest" at 100 TB).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

TORN_MOD = 89

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16le"),
    (b"\xfe\xff", "utf-16be"),
)


def utf8_walk(payload: bytes) -> tuple[bool, int, int]:
    """(valid, n_multibyte_seqs, err_offset): the RFC 3629 validation
    walk. err_offset is -1 when valid, else the byte offset of the
    first violation (truncation counts — a torn tail is a violation
    AT the sequence start, which is what a sniffer reports)."""
    i, n, multi = 0, len(payload), 0
    while i < n:
        b = payload[i]
        if b < 0x80:
            i += 1
            continue
        if 0xC2 <= b <= 0xDF:
            need, lo, hi = 1, 0x80, 0xBF
        elif b == 0xE0:
            need, lo, hi = 2, 0xA0, 0xBF  # overlong guard
        elif 0xE1 <= b <= 0xEC or b == 0xEE or b == 0xEF:
            need, lo, hi = 2, 0x80, 0xBF
        elif b == 0xED:
            need, lo, hi = 2, 0x80, 0x9F  # surrogate guard
        elif b == 0xF0:
            need, lo, hi = 3, 0x90, 0xBF  # overlong guard
        elif 0xF1 <= b <= 0xF3:
            need, lo, hi = 3, 0x80, 0xBF
        elif b == 0xF4:
            need, lo, hi = 3, 0x80, 0x8F  # > U+10FFFF guard
        else:
            return False, multi, i  # C0/C1 overlong lead or stray cont.
        # first continuation byte has the sequence-specific range; the
        # rest are plain 80..BF; a truncated tail fails the bounds check
        j = i + 1
        if j >= n or not (lo <= payload[j] <= hi):
            return False, multi, i
        for j in range(i + 2, i + need + 1):
            if j >= n or not (0x80 <= payload[j] <= 0xBF):
                return False, multi, i
        multi += 1
        i += need + 1
    return True, multi, -1


def sniff_charset(payload: bytes) -> dict:
    """The deterministic sniff: BOM > strict-utf8 > ascii > latin-1.
    Returns detected charset, BOM name (or None), decoded text, and
    the utf-8 walk's diagnostics."""
    for bom, name in _BOMS:
        if payload.startswith(bom):
            body = payload[len(bom):]
            try:
                text = body.decode(name)
                err = None
            except UnicodeDecodeError as exc:
                text, err = None, f"BOM-declared {name} but: {exc.reason}"
            return {
                "bom": name,
                "detected": name,
                "text": text,
                "n_multibyte": None,
                "err_offset": None,
                "error": err,
            }
    valid, multi, off = utf8_walk(payload)
    if valid:
        detected = "utf-8" if multi else "ascii"
        return {
            "bom": None,
            "detected": detected,
            "text": payload.decode("utf-8"),
            "n_multibyte": multi,
            "err_offset": -1,
            "error": None,
        }
    return {
        "bom": None,
        "detected": "latin-1",
        "text": payload.decode("latin-1"),
        "n_multibyte": multi,
        "err_offset": off,
        "error": None,
    }


# ---------------------------------------------------------------- build

def _encode_payload(doc_id: int, text: str) -> bytes:
    """Deterministic per-residue re-encoding of the document text.
    latin-1 rows append a planted non-ASCII byte so the utf-8 walk
    REALLY fails on them (the documents corpus is ASCII); torn rows
    truncate INSIDE a multibyte sequence."""
    arm = doc_id % 6
    if arm == 0:
        p = (text + " café").encode("utf-8")
    elif arm == 1:
        p = b"\xef\xbb\xbf" + text.encode("utf-8")
    elif arm == 2:
        p = b"\xff\xfe" + text.encode("utf-16le")
    elif arm == 3:
        p = b"\xfe\xff" + text.encode("utf-16be")
    elif arm == 4:
        p = (text + " café").encode("latin-1", errors="replace")
    else:
        p = text.encode("ascii", errors="replace")
    if doc_id % TORN_MOD == 0:
        # cut inside a trailing utf-8 multibyte sequence
        p = (text + " café").encode("utf-8")[:-1]
    return p


def _synthesize_charset(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            _encode_payload(int(did), t)
            for did, t in zip(pdf["doc_id"], pdf["text"])
        ]
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].values, "payload": payloads}
        )


_SNIFF_SCHEMA = (
    "doc_id long, n_bytes long, bom string, detected string, "
    "n_chars long, n_multibyte long, err_offset long, error string"
)


def _sniff_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "doc_id", "n_bytes", "bom", "detected", "n_chars", "n_multibyte",
        "err_offset", "error",
    ]
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            p = bytes(r.payload)
            s = sniff_charset(p)
            rows.append(
                {
                    "doc_id": r.doc_id,
                    "n_bytes": len(p),
                    "bom": s["bom"],
                    "detected": s["detected"],
                    "n_chars": len(s["text"]) if s["text"] is not None else None,
                    "n_multibyte": s["n_multibyte"],
                    "err_offset": s["err_offset"],
                    "error": s["error"],
                }
            )
        out = pd.DataFrame(rows, columns=cols)
        # all-None int columns must stay integer (the B120 lesson)
        for c in ("n_chars", "n_multibyte", "err_offset"):
            out[c] = out[c].astype("Int64")
        yield out


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset verdict per synthesized payload: BOM > strict-utf8 >
    ascii > latin-1, with the utf-8 walk's diagnostics. (Unregistered
    — payload bytes never exist in SQL; hand-packed goldens +
    round-trip + torn arms in tests/test_charset.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(
        _synthesize_charset, "doc_id long, payload binary"
    )
    return payloads.mapInPandas(_sniff_batch, _SNIFF_SCHEMA)


UNREGISTERED_CHARSET_QUERIES = {"q_charset_sniff": q_charset_sniff}
