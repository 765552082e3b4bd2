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


# ------------------------------------------------ day-2 incremental

def _mk_urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_incremental_url_dedup_two_batches(spark, tmp_path):
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        build_url_index,
        incremental_url_dedup,
        ingest_url_batch,
    )

    ix = str(tmp_path / "urlix")
    day1 = _mk_urls(
        spark,
        [
            (1, "http://a.com/x?utm_source=s"),
            (2, "HTTP://WWW.A.com/x/"),       # same canonical as 1
            (3, "https://b.com/y"),
        ],
    )
    build_url_index(day1, ix, spark)

    day2 = _mk_urls(
        spark,
        [
            (10, "http://a.com/x"),            # dup of history (canon=1)
            (11, "https://c.com/new"),         # fresh
            (12, "https://c.com/new#frag"),    # in-batch dup of 11
            (13, "https://b.com:443/y"),       # dup of history (canon=3)
        ],
    )
    out = {
        r["doc_id"]: r
        for r in ingest_url_batch(spark, day2, ix, unit="u000001").collect()
    }
    assert out[10]["status"] == "url_dup" and out[10]["matched_id"] == 1
    assert out[11]["status"] == "kept" and out[11]["matched_id"] is None
    assert out[12]["status"] == "url_dup" and out[12]["matched_id"] == 11
    assert out[13]["status"] == "url_dup" and out[13]["matched_id"] == 3

    # day-3 batch sees day-2's kept canonical in history now
    day3 = _mk_urls(spark, [(20, "https://c.com/new?fbclid=z")])
    v = incremental_url_dedup(spark, day3, ix).collect()[0]
    assert v["status"] == "url_dup" and v["matched_id"] == 11


def test_incremental_url_dedup_replay_idempotent(spark, tmp_path):
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        _read_url_index,
        build_url_index,
        incremental_url_dedup,
        ingest_url_batch,
    )

    ix = str(tmp_path / "urlix")
    build_url_index(_mk_urls(spark, [(1, "http://a.com/x")]), ix, spark)
    batch = _mk_urls(spark, [(10, "http://d.com/z"), (11, "http://a.com/x")])
    first = sorted(
        map(tuple, ingest_url_batch(spark, batch, ix, unit="u000001").collect())
    )
    # replay the SAME unit (crash after commit, reprocessed trigger)
    second = sorted(
        map(tuple, ingest_url_batch(spark, batch, ix, unit="u000001").collect())
    )
    assert first == second
    # index state identical: one canonical row for d.com/z, probe-side
    # re-aggregation keeps later batches correct either way
    rows = _read_url_index(spark, ix).collect()
    assert [
        (r["canonical_url"], r["canonical_id"])
        for r in rows
        if "d.com" in r["canonical_url"]
    ] == [("http://d.com/z", 10)]
    probe = incremental_url_dedup(
        spark, _mk_urls(spark, [(30, "http://d.com/z/")]), ix
    ).collect()[0]
    assert probe["status"] == "url_dup" and probe["matched_id"] == 10


def test_incremental_url_dedup_crash_window(spark, tmp_path):
    import os as _o

    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        build_url_index,
        incremental_url_dedup,
    )

    ix = str(tmp_path / "urlix")
    build_url_index(_mk_urls(spark, [(1, "http://a.com/x")]), ix, spark)
    # simulate a crash BETWEEN the unit parquet write and the marker
    # commit: write rows under an uncommitted unit by hand
    torn = _mk_urls(spark, [(99, "http://torn.com/p")])
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        canonicalize_urls,
    )
    from pyspark.sql import functions as F

    canonicalize_urls(torn).select(
        "canonical_url", F.col("doc_id").alias("canonical_id")
    ).write.mode("overwrite").parquet(_o.path.join(ix, "canon", "unit=u000009"))
    # no marker -> invisible: the same URL classifies as KEPT
    v = incremental_url_dedup(
        spark, _mk_urls(spark, [(100, "http://torn.com/p")]), ix
    ).collect()[0]
    assert v["status"] == "kept"


def test_incremental_matches_from_scratch_union(spark, tmp_path):
    # first-fetch-wins across days == batch url_dedup over the union,
    # when doc_ids increase with time (the crawl invariant)
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        build_url_index,
        canonicalize_urls,
        ingest_url_batch,
        url_dedup,
    )

    ix = str(tmp_path / "urlix")
    day1 = _mk_urls(
        spark,
        [(1, "http://a.com/x"), (2, "http://b.com/y?utm_source=s")],
    )
    day2 = _mk_urls(
        spark,
        [
            (10, "HTTP://A.com/x/"),
            (11, "http://c.com/z"),
            (12, "http://c.com/z#f"),
        ],
    )
    build_url_index(day1, ix, spark)
    v2 = ingest_url_batch(spark, day2, ix, unit="u000001").collect()
    inc_kept = {1, 2} | {r["doc_id"] for r in v2 if r["status"] == "kept"}
    batch = url_dedup(canonicalize_urls(day1.unionByName(day2))).collect()
    scratch_kept = {r["doc_id"] for r in batch if r["keep"]}
    assert inc_kept == scratch_kept


def test_compact_url_index(spark, tmp_path):
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        _read_url_index,
        build_url_index,
        compact_url_index,
        incremental_url_dedup,
        ingest_url_batch,
    )

    ix = str(tmp_path / "urlix")
    build_url_index(_mk_urls(spark, [(1, "http://a.com/x")]), ix, spark)
    ingest_url_batch(
        spark, _mk_urls(spark, [(10, "http://b.com/y")]), ix, unit="u000001"
    )
    ingest_url_batch(
        spark,
        # a re-crawl of a.com/x: dup, contributes nothing to the index
        _mk_urls(spark, [(20, "http://c.com/z"), (21, "HTTP://A.com/x/")]),
        ix,
        unit="u000002",
    )
    before = sorted(map(tuple, _read_url_index(spark, ix).collect()))
    res = compact_url_index(spark, ix)
    assert res["compacted_units"] == 3 and res["unit"].startswith("c")
    after = sorted(map(tuple, _read_url_index(spark, ix).collect()))
    # identical logical content, one unit, probes unchanged
    assert before == after and res["rows"] == 3
    from data_ingestion_api_system_loop_ai_spark.sources.commit_protocol import (
        committed_units,
    )

    assert committed_units(ix) == [res["unit"]]
    v = incremental_url_dedup(
        spark, _mk_urls(spark, [(30, "http://b.com/y#f")]), ix
    ).collect()[0]
    assert v["status"] == "url_dup" and v["matched_id"] == 10
    # compacting a compacted index is a no-op
    assert compact_url_index(spark, ix)["compacted_units"] == 0


def test_compact_url_index_writes_numbered_files(spark, tmp_path):
    """VERDICT r10 #2: the compactor's consolidated units are NUMBERED
    repartitions, not a coalesce(1) single task — at a forced n the
    c-unit lands as multiple parquet files for BOTH stores while the
    logical content is unchanged."""
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        _read_url_index,
        build_url_index,
        compact_url_index,
        ingest_url_batch,
    )
    from data_ingestion_api_system_loop_ai_spark.sources.maintenance import (
        parquet_files,
    )

    ix = str(tmp_path / "urlix")
    out = str(tmp_path / "kept")
    build_url_index(_mk_urls(spark, [(1, "http://a.com/x")]), ix, spark)
    for i, (did, url) in enumerate(
        [(10, "http://b.com/y"), (20, "http://c.com/z"), (30, "http://d.com/w")]
    ):
        batch = _mk_urls(spark, [(did, url)])
        unit = f"u{i + 1:06d}"
        v = ingest_url_batch(spark, batch, ix, unit=unit)
        # a kept-pages twin unit so the out_path arm is exercised too
        v.filter("status = 'kept'").selectExpr(
            "doc_id", "canonical_url as url", "'body' as content"
        ).write.mode("overwrite").parquet(
            os.path.join(out, f"unit={unit}")
        )
    before = sorted(map(tuple, _read_url_index(spark, ix).collect()))
    res = compact_url_index(spark, ix, out_path=out, n_files=3)
    assert res["compacted_units"] == 4
    after = sorted(map(tuple, _read_url_index(spark, ix).collect()))
    assert before == after
    cunit = res["unit"]
    assert len(parquet_files(os.path.join(ix, "canon", f"unit={cunit}"))) > 1
    assert len(parquet_files(os.path.join(out, f"unit={cunit}"))) > 1


def test_ingest_url_batch_replay_after_compaction_raises(spark, tmp_path):
    """ADVICE r10: replaying a unit label that a compaction already
    folded into the c-unit cannot return honest verdicts (the batch's
    own rows live in the c-unit, exclude_unit no longer hides them) —
    the replay raises instead of classifying every doc as a dup of
    itself."""
    import pytest

    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        build_url_index,
        compact_url_index,
        ingest_url_batch,
    )

    ix = str(tmp_path / "urlix")
    build_url_index(_mk_urls(spark, [(1, "http://a.com/x")]), ix, spark)
    batch = _mk_urls(spark, [(10, "http://b.com/y")])
    ingest_url_batch(spark, batch, ix, unit="u000001")
    compact_url_index(spark, ix)
    with pytest.raises(RuntimeError, match="compacted away"):
        ingest_url_batch(spark, batch, ix, unit="u000001")
