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
                     land on 18's canonical URL. 18 is THIN, so it is
                     not eligible for the dedup gate — the first
                     ELIGIBLE fetch (35) is kept and 52 is url_dup
                     (the each-gate-sees-what-passed rule)
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
    # 18 holds the group's min doc_id but is thin, hence ineligible:
    # the first ELIGIBLE fetch (35) is kept, 52 dedups against it
    assert out[35]["verdict"] == "kept"
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


def test_crawl_stream_writer_end_to_end(spark, tmp_path):
    """The live crawl front door: three triggers through the composed
    verdict chain — fresh kept, robots-blocked dropped, torn dropped,
    thin dropped, re-crawl of an earlier trigger's canonical URL
    dropped against the PERSISTED index — with the kept corpus and the
    URL index publishing under one marker per trigger."""
    import os as _o
    import shutil as _sh

    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.operators.crawl_funnel import (
        crawl_stream_writer,
        read_crawled,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.robots import (
        parse_robots_rules,
        synthesize_robots,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        _read_url_index,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.warc import (
        build_warc_file,
    )

    good = (
        "<html><body><h1>big clean title</h1><p>"
        + "plain honest prose word " * 10
        + "</p></body></html>"
    )
    thin = "<html><body><p>tiny page</p></body></html>"

    def warc(doc_id, html, torn=False):
        p = build_warc_file(doc_id, html)
        return p[: len(p) - len(p) // 4] if torn else p

    triggers = [
        # doc 1 (site1, item-1): kept; doc 5 (site0): robots-blocked;
        # doc 0: torn
        [(1, warc(1, good)), (5, warc(5, good)), (0, warc(0, good, torn=True))],
        # doc 86 (site1, item-1 == doc 1's canonical): url_dup vs the
        # index; doc 7: thin; doc 2 (site2, item-2): kept
        [(86, warc(86, good)), (7, warc(7, thin)), (2, warc(2, good))],
    ]
    src = tmp_path / "warc_in"
    src.mkdir()
    stage = tmp_path / "stage"
    for i, rows in enumerate(triggers):
        df = spark.createDataFrame(
            [(d, bytearray(p)) for d, p in rows], "doc_id long, warc binary"
        )
        sdir = str(stage / f"s{i}")
        df.coalesce(1).write.mode("overwrite").parquet(sdir)
        part = next(
            f for f in _o.listdir(sdir) if f.endswith(".parquet")
        )
        dst = src / f"b{i}.parquet"
        _sh.copy(_o.path.join(sdir, part), dst)
        _o.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("doc_id long, warc binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    ix, out, ckpt = (str(tmp_path / d) for d in ("urlix", "kept", "ckpt"))
    rules = parse_robots_rules(synthesize_robots(spark))
    q = (
        crawl_stream_writer(spark, stream, rules, ix, out, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    kept = {r["doc_id"]: r for r in read_crawled(spark, out, ix).collect()}
    assert set(kept) == {1, 2}
    # the WARC URI carries the full g-identity since ADVICE r11 #4:
    # scheme https for odd g, id/section query
    assert kept[1]["url"] == "https://site1.example.com/news/item-1?id=1&section=1"
    assert "big clean title" in kept[1]["content"]
    # the index holds exactly the kept canonicals, doc 86's canonical
    # resolving to doc 1 (first fetch won across triggers)
    ixrows = {
        r["canonical_url"]: r["canonical_id"]
        for r in _read_url_index(spark, ix).collect()
    }
    assert ixrows == {
        "https://site1.example.com/news/item-1?id=1&section=1": 1,
        "http://site2.example.com/news/item-2?id=2&section=2": 2,
    }


def test_compact_preserves_crawled_corpus(spark, tmp_path):
    """Index compaction with out_path consolidates the kept-pages units
    under the same superseding marker — read_crawled sees the identical
    corpus before and after (the index-only footgun is documented and
    test-pinned here)."""
    import os as _o
    import shutil as _sh

    from data_ingestion_api_system_loop_ai_spark.operators.crawl_funnel import (
        crawl_stream_writer,
        read_crawled,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.robots import (
        parse_robots_rules,
        synthesize_robots,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        compact_url_index,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.warc import (
        build_warc_file,
    )

    good = (
        "<html><body><h1>big clean title</h1><p>"
        + "plain honest prose word " * 10
        + "</p></body></html>"
    )
    triggers = [[(1, build_warc_file(1, good))], [(2, build_warc_file(2, good))]]
    src = tmp_path / "warc_in"
    src.mkdir()
    for i, rows in enumerate(triggers):
        df = spark.createDataFrame(
            [(d, bytearray(p)) for d, p in rows], "doc_id long, warc binary"
        )
        sdir = str(tmp_path / f"s{i}")
        df.coalesce(1).write.mode("overwrite").parquet(sdir)
        part = next(f for f in _o.listdir(sdir) if f.endswith(".parquet"))
        dst = src / f"b{i}.parquet"
        _sh.copy(_o.path.join(sdir, part), dst)
        _o.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    ix, out, ckpt = (str(tmp_path / d) for d in ("urlix", "kept", "ckpt"))
    rules = parse_robots_rules(synthesize_robots(spark))
    stream = (
        spark.readStream.schema("doc_id long, warc binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        crawl_stream_writer(spark, stream, rules, ix, out, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    before = sorted(map(tuple, read_crawled(spark, out, ix).collect()))
    assert len(before) == 2
    res = compact_url_index(spark, ix, out_path=out)
    assert res["compacted_units"] == 2
    after = sorted(map(tuple, read_crawled(spark, out, ix).collect()))
    assert before == after


def test_crawl_stream_crash_matrix_replay_converges(spark, tmp_path):
    """VERDICT r10 #6 — parameterized kill between every adjacent
    durable-effect pair of the crawl front door (kept-pages write ->
    canonical-index append -> unit marker): for each crash point,
    batch 1 is killed right after the named effect lands, then
    replayed without the fault, and the final state (kept corpus,
    canonical index, and the re-crawl verdicts a NEXT batch computes)
    is IDENTICAL to the never-crashed golden run. A replay of a fully
    published unit is additionally pinned as a wholesale no-op."""
    import pytest

    from data_ingestion_api_system_loop_ai_spark.operators.crawl_funnel import (
        crawl_batch_ingest,
        read_crawled,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.robots import (
        parse_robots_rules,
        synthesize_robots,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        _read_url_index,
        incremental_url_dedup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.warc import (
        build_warc_file,
    )

    good = (
        "<html><body><h1>big clean title</h1><p>"
        + "plain honest prose word " * 10
        + "</p></body></html>"
    )
    thin = "<html><body><p>tiny page</p></body></html>"

    def warc(doc_id, html, torn=False):
        p = build_warc_file(doc_id, html)
        return p[: len(p) - len(p) // 4] if torn else p

    batches = [
        # b0: doc 1 kept (site1/item-1); doc 5 robots-blocked (site0)
        [(1, warc(1, good)), (5, warc(5, good))],
        # b1 (the killed batch): doc 86 re-crawls doc 1's canonical
        # (url_dup vs the index), doc 7 thin, doc 2 kept, doc 0 torn
        [
            (86, warc(86, good)),
            (7, warc(7, thin)),
            (2, warc(2, good)),
            (0, warc(0, good, torn=True)),
        ],
    ]
    rules = parse_robots_rules(synthesize_robots(spark)).persist()

    def mk_batch(rows):
        return spark.createDataFrame(
            [(d, bytearray(p)) for d, p in rows], "doc_id long, warc binary"
        )

    def run(root, effect_hook=None, crash_expected=False):
        ix = str(root / "ix")
        out = str(root / "kept")
        crashed = False
        for i, rows in enumerate(batches):
            df = mk_batch(rows)
            try:
                crawl_batch_ingest(
                    spark, df, i, rules, ix, out, effect_hook=effect_hook
                )
            except RuntimeError as exc:
                assert "injected crash" in str(exc)
                crashed = True
                # restart: replay the same batch id without the fault
                crawl_batch_ingest(spark, df, i, rules, ix, out)
        assert crashed == crash_expected
        return ix, out

    def snapshot(ix, out):
        corpus = sorted(
            map(tuple, read_crawled(spark, out, ix).collect())
        )
        index = sorted(
            map(tuple, _read_url_index(spark, ix).collect())
        )
        # state equivalence via the verdicts a next batch would compute
        # (probe URLs are MESSY spellings that canonicalize into the
        # kept pages' groups — the full-identity WARC URIs of ADVICE
        # r11 #4)
        probe = spark.createDataFrame(
            [
                (9000, "HTTPS://WWW.Site1.Example.COM:443/news//item-1?section=1&id=1&utm_campaign=x"),
                (9001, "http://site2.example.com/news/item-2/?id=2&section=2&fbclid=abc"),
                (9002, "http://site4.example.com/news/fresh"),
            ],
            "doc_id long, url string",
        )
        verdicts = sorted(
            map(tuple, incremental_url_dedup(spark, probe, ix).collect())
        )
        return corpus, index, verdicts

    golden_root = tmp_path / "golden"
    golden_root.mkdir()
    golden = snapshot(*run(golden_root))
    # construction sanity: kept = {1, 2}, both canonicals indexed, the
    # probe dedups both seen URLs and keeps the fresh one
    assert {r[0] for r in golden[0]} == {1, 2}
    assert {r[0] for r in golden[1]} == {
        "https://site1.example.com/news/item-1?id=1&section=1",
        "http://site2.example.com/news/item-2?id=2&section=2",
    }
    assert {(v[0], v[2]) for v in golden[2]} == {
        (9000, "url_dup"), (9001, "url_dup"), (9002, "kept"),
    }

    for stage in ("kept_written", "canon_written"):
        def hook(s, batch_id, _stage=stage):
            if s == _stage and batch_id == 1:
                raise RuntimeError(f"injected crash after {s}")

        root = tmp_path / f"crash_{stage}"
        root.mkdir()
        got = snapshot(*run(root, effect_hook=hook, crash_expected=True))
        assert got == golden, f"state diverged after crash at {stage}"

    # crash AFTER the marker (before the stream checkpoint records the
    # batch): the replay hits the ever-published guard and is a no-op
    root = tmp_path / "post_marker"
    root.mkdir()
    ix, out = run(root)
    before = snapshot(ix, out)
    crawl_batch_ingest(spark, mk_batch(batches[1]), 1, rules, ix, out)
    assert snapshot(ix, out) == before
    rules.unpersist()
