"""URL canonicalization + URL-level dedup (B123, ``operators/urls.py``).

Driver-grade DuckDB parity over the WHOLE pipeline (the URL synthesis
string is shared verbatim by both engines), per-rule golden URLs for
the normalization ladder, and group invariants (one keep per canonical
group, n_dups consistent, raw forms genuinely differ inside a group).
"""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.urls import (
    URL_DEDUP_ORACLE,
    canonicalize_urls,
    q_url_dedup,
    synthesize_urls,
    url_dedup,
)

from .oracle_utils import compare, duckdb_con


def test_url_dedup_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(q_url_dedup(spark, sf_dir), con, URL_DEDUP_ORACLE)
    finally:
        con.close()


GOLDENS = [
    # every rule at once: case, www., default port, dup slash,
    # tracking param, param sort, fragment
    (
        "HTTP://WWW.Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a/b?a=1&b=2",
    ),
    # non-default port kept; root path's trailing slash kept
    ("https://site.com:8443/", "https://site.com:8443/"),
    # https default port dropped; trailing slash stripped off a real path
    ("https://Site.com:443/x/", "https://site.com/x"),
    # empty path -> '/'
    ("http://a.com", "http://a.com/"),
    # all params tracking -> query dropped entirely
    ("http://a.com/?fbclid=1&gclid=2&msclkid=3&utm_campaign=c", "http://a.com/"),
    # byte-order param sort
    ("http://www.a.com/p?z=1&y=2&x=3", "http://a.com/p?x=3&y=2&z=1"),
    # fragment-only mess
    ("http://a.com/p#only-frag", "http://a.com/p"),
    # a param NAMED like tracking but not in the family survives
    # (utmost: substr-4 'utmo' != 'utm_'; fbclid2 not an exact match)
    ("http://a.com/p?utmost=1&fbclid2=2", "http://a.com/p?fbclid2=2&utmost=1"),
    # www. stripped only as a leading label, not mid-host
    ("http://wwwx.www.net/p", "http://wwwx.www.net/p"),
]


def test_canonicalize_golden_urls(spark):
    pages = spark.createDataFrame(
        [(i, raw) for i, (raw, _want) in enumerate(GOLDENS)],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["canonical_url"]
        for r in canonicalize_urls(pages).collect()
    }
    for i, (_raw, want) in enumerate(GOLDENS):
        assert got[i] == want, f"golden {i}: {got[i]!r} != {want!r}"


def test_url_dedup_group_invariants(spark, sf_dir):
    rows = q_url_dedup(spark, sf_dir).collect()
    assert rows
    groups = defaultdict(list)
    for r in rows:
        groups[r["canonical_url"]].append(r)
    assert any(len(g) > 1 for g in groups.values()), "no collision groups"
    for canon, members in groups.items():
        # n_dups is the group size on every member
        assert all(m["n_dups"] == len(members) for m in members)
        # exactly one keep, and it is the smallest doc_id
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1
        assert keeps[0]["doc_id"] == min(m["doc_id"] for m in members)
        # the mess is real: members of a multi-doc group arrive with
        # more than one raw spelling
        if len(members) > 2:
            assert len({m["url"] for m in members}) > 1, canon


def test_url_dedup_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_url_dedup(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_url_dedup(spark, sf_dir).collect()))
    assert a == b


def test_synthesized_urls_carry_planted_mess(spark, sf_dir):
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = [r["url"] for r in synthesize_urls(docs).limit(24).collect()]
    blob = " ".join(urls)
    for marker in (
        "HTTP://", "https://", "WWW.", "//item-", "#comments",
        "utm_source", "fbclid", ":8080",
    ):
        assert marker in blob, marker


def test_url_dedup_viral_group_rollup(spark):
    # a single canonical URL re-crawled many times stays one aggregate
    # row (groupBy+join-back): every copy resolves, exactly one keep
    raw = [(i, f"http://HOT.example.com/story?utm_source=s{i}") for i in range(200)]
    raw.append((999, "http://cold.example.com/other"))
    df = spark.createDataFrame(raw, "doc_id long, url string")
    out = url_dedup(canonicalize_urls(df)).collect()
    hot = [r for r in out if "hot.example.com" in r["canonical_url"]]
    assert len(hot) == 200
    assert all(r["n_dups"] == 200 for r in hot)
    assert sum(r["keep"] for r in hot) == 1
    cold = [r for r in out if "cold" in r["canonical_url"]]
    assert len(cold) == 1 and cold[0]["keep"] and cold[0]["n_dups"] == 1
