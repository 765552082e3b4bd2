"""Charset sniffing (B126, ``operators/charset.py``).

The utf-8 validation walk is cross-checked against CPython's codec on
randomized byte strings (Hypothesis-style but with a fixed seed — the
codec IS the spec), plus hand-packed goldens for every RFC 3629
rejection class, per-arm round-trip over the synthesized corpus, and
the torn arm.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.charset import (
    TORN_MOD,
    q_charset_sniff,
    sniff_charset,
    utf8_walk,
)


def test_utf8_walk_matches_cpython_codec():
    rng = random.Random(20260816)
    for _ in range(5000):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 16)))
        valid, _multi, off = utf8_walk(b)
        try:
            b.decode("utf-8")
            pyvalid = True
        except UnicodeDecodeError:
            pyvalid = False
        assert valid == pyvalid, b.hex()
        assert (off == -1) == valid


def test_sniff_goldens():
    cases = {
        b"abc": "ascii",
        "héllo".encode(): "utf-8",
        b"\xc0\xaf": "latin-1",          # overlong '/'
        b"\xc1\xbf": "latin-1",          # overlong lead C1
        b"\xe0\x80\x80": "latin-1",      # overlong 3-byte
        b"\xed\xa0\x80": "latin-1",      # UTF-16 surrogate
        b"\xf0\x80\x80\x80": "latin-1",  # overlong 4-byte
        b"\xf4\x90\x80\x80": "latin-1",  # > U+10FFFF
        b"\xf0\x9f\x98\x80": "utf-8",    # emoji (4-byte)
        "café".encode()[:-1]: "latin-1",  # torn multibyte tail
        b"\x80abc": "latin-1",           # stray continuation byte
        b"\xef\xbb\xbfhi": "utf-8",      # BOM wins
        b"\xff\xfeh\x00i\x00": "utf-16le",
        b"\xfe\xff\x00h\x00i": "utf-16be",
        b"": "ascii",
    }
    for b, want in cases.items():
        s = sniff_charset(b)
        assert s["detected"] == want, (b.hex(), s["detected"], want)
        # latin-1 fallback always yields text, byte-for-codepoint
        if want == "latin-1":
            assert s["text"] == b.decode("latin-1")


def test_sniff_bom_precedence_over_invalid_body():
    # a BOM-declared utf-16le body with an odd byte count cannot decode:
    # the sniff reports the declaration AND the error, as an error row
    s = sniff_charset(b"\xff\xfeh\x00i")
    assert s["detected"] == "utf-16le" and s["error"] is not None


def test_charset_sniff_arms_round_trip(spark, sf_dir):
    rows = {r["doc_id"]: r for r in q_charset_sniff(spark, sf_dir).collect()}
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert rows.keys() == texts.keys()
    seen = set()
    for did, r in rows.items():
        if did % TORN_MOD == 0:
            # torn inside the planted multibyte tail: latin-1 fallback,
            # err_offset points into the payload
            assert r["detected"] == "latin-1"
            assert r["err_offset"] >= 0
            seen.add("torn")
            continue
        arm = did % 6
        want = {
            0: "utf-8",      # planted ' café' forces a multibyte seq
            1: "utf-8",      # BOM
            2: "utf-16le",
            3: "utf-16be",
            4: "latin-1",    # latin-1 'é' byte is invalid utf-8
            5: "ascii",
        }[arm]
        assert r["detected"] == want, (did, arm, r["detected"])
        assert r["error"] is None
        if arm == 1:
            assert r["bom"] == "utf-8"
            assert r["n_chars"] == len(texts[did])  # BOM not counted
        if arm == 0:
            assert r["n_multibyte"] == 1  # exactly the planted é
        if arm == 5:
            assert r["n_multibyte"] == 0
        seen.add(want if arm != 1 else "utf-8-bom")
    # every arm occurs at every SF
    assert {"utf-8", "utf-8-bom", "utf-16le", "utf-16be", "latin-1",
            "ascii", "torn"} <= seen


def test_charset_sniff_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_charset_sniff(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_charset_sniff(spark, sf_dir).collect()))
    assert a == b
