"""Crawl-ingest funnel capstone — B125.

The ingest-side sibling of ``build_training_corpus``: composes the
round-10 ingest stages into the single verdict pass a crawl pipeline
runs per fetched page —

1. FETCH   (B122): WARC record framing; a torn file means the page
   never arrived (``verdict = 'torn'``);
2. POLICY  (B124): RFC 9309 robots verdict on the page's canonical
   URL (``'blocked'``);
3. EXTRACT (B121): boilerplate removal over the HTTP response body —
   pages whose main content is below the funnel floor
   (< MIN_CONTENT_CHARS kept chars) are ``'thin'``;
4. DEDUP   (B123): URL-canonicalization first-fetch-wins — among the
   docs that PASSED the earlier gates (a canonical group whose
   smallest doc_id was torn/blocked/thin still keeps its first good
   fetch; ``'url_dup'``);
5. survivors are ``'kept'``.

Precedence is the pipeline order: a torn page is 'torn' even if its
URL would also have been blocked — each stage only sees what the
previous one passed, and the verdict names the FIRST gate that fired
(the q_funnel_explain drop-attribution discipline).

Spark shape: the WARC stage is the two mapInPandas passes it already
is; everything downstream is JVM expressions and three doc_id
equi-joins of per-doc relations (no fan-out — every stage emits one
row per doc). The oracle composes the stage oracles: B121's
full-pipeline extraction oracle (valid because the response body
round-trips byte-identically, proven by B122's equality pin), B124's
robots chain, B123's canonical groups — so the WHOLE funnel,
synthesis included, is DuckDB-checkable except the torn-detection
itself, which enters the oracle as the same ``doc_id % TORN_MOD``
residue the synthesizer plants (and which B122's direct tests verify
the parser actually detects).

Reference parity: none; BASELINE.json north-star capstone tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table
from .html_extract import HTML_EXTRACT_ORACLE, extract_main_content
from .robots import (
    ROBOTS_FILTER_ORACLE,
    parse_robots_rules,
    robots_filter,
    synthesize_robots,
)
from .urls import URL_DEDUP_ORACLE, canonicalize_urls, synthesize_urls
from .warc import TORN_MOD, warc_files, warc_records

MIN_CONTENT_CHARS = 40


def q_crawl_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fetched, allowed, content_chars, keep_url, verdict):
    one verdict row per crawled document, verdict = the first gate
    that fired in pipeline order (torn → blocked → thin → url_dup →
    kept). (Unregistered — 50-slot cap; driver-grade DuckDB parity of
    the composed funnel in tests/test_crawl_funnel.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    # the WARC synthesize+parse chain (the only Python in the funnel)
    # feeds TWO consumers (the fetched aggregate and the body
    # projection); divergently-pruned subtrees never canonicalize
    # equal, so without a checkpoint the Arrow passes run twice per
    # action. Lazy localCheckpoint; bench/probe sweeps release it
    # between timed windows (plans/lifecycle discipline).
    recs = warc_records(warc_files(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    fetched = recs.groupBy("doc_id").agg(
        F.max(
            ((F.col("warc_type") == "response") & F.col("error").isNull())
            .cast("int")
        ).alias("_f")
    ).select("doc_id", (F.col("_f") == 1).alias("fetched"))
    bodies = recs.filter(
        (F.col("warc_type") == "response") & F.col("error").isNull()
    ).select("doc_id", F.col("body").alias("html"))

    # the canonical-URL relation feeds THREE consumers (robots policy,
    # the eligible-group min, the keep_url attribution) and each
    # reference re-instantiates the synthesize+canonicalize expression
    # chain (r14, guide §2.4 — same boundary discipline as ``recs``
    # above); one lazy checkpoint materializes it once
    canon = canonicalize_urls(synthesize_urls(docs)).localCheckpoint(
        eager=False
    )
    policy = robots_filter(
        canon.select("doc_id", "canonical_url"),
        parse_robots_rules(synthesize_robots(spark)),
    ).select("doc_id", "allowed")

    content = extract_main_content(bodies).select("doc_id", "content_chars")

    base = (
        docs.join(fetched, "doc_id")
        .join(policy, "doc_id")
        .join(content, "doc_id", "left")
    )
    # first-fetch-wins among ELIGIBLE docs only (each gate sees what
    # the previous one passed): a canonical group whose smallest doc_id
    # was torn/blocked/thin must still keep its first GOOD fetch — the
    # same semantics crawl_stream_writer has by construction (it
    # classifies only post-gate pages against the index)
    eligible = base.filter(
        F.col("fetched")
        & F.col("allowed")
        & (F.coalesce(F.col("content_chars"), F.lit(0)) >= MIN_CONTENT_CHARS)
    ).select("doc_id")
    groups = (
        canon.join(eligible, "doc_id")
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    keep_url = canon.join(groups, "canonical_url", "left").select(
        "doc_id",
        F.coalesce(F.col("doc_id") == F.col("_keep_id"), F.lit(False)).alias(
            "keep_url"
        ),
    )

    joined = base.join(keep_url, "doc_id")
    verdict = (
        F.when(~F.col("fetched"), F.lit("torn"))
        .when(~F.col("allowed"), F.lit("blocked"))
        .when(
            F.coalesce(F.col("content_chars"), F.lit(0))
            < MIN_CONTENT_CHARS,
            F.lit("thin"),
        )
        .when(~F.col("keep_url"), F.lit("url_dup"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        "doc_id", "fetched", "allowed", "content_chars", "keep_url",
        verdict.alias("verdict"),
    )


def q_crawl_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(verdict, n_docs): the funnel's drop attribution — every doc
    lands in exactly one bucket, so the counts sum to the corpus."""
    return (
        q_crawl_funnel(spark, sf_dir)
        .groupBy("verdict")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def _subq(sql: str) -> str:
    return "(" + sql + ")"


# The composed oracle: stage oracles as subqueries (each carries its
# own WITH chain — DuckDB scopes them per subquery, so the shared CTE
# names never collide), torn-ness as the planted residue.
CRAWL_FUNNEL_ORACLE = f"""
WITH fetched AS (
  SELECT doc_id, doc_id % {TORN_MOD} <> 0 AS fetched FROM documents
),
policy AS (
  SELECT doc_id, allowed FROM {_subq(ROBOTS_FILTER_ORACLE)}
),
urlsq AS (
  SELECT doc_id, canonical_url FROM {_subq(URL_DEDUP_ORACLE)}
),
content AS (
  SELECT doc_id, content_chars FROM {_subq(HTML_EXTRACT_ORACLE)}
  WHERE doc_id % {TORN_MOD} <> 0
),
eligible AS (
  SELECT f.doc_id
  FROM fetched f
  JOIN policy p USING (doc_id)
  LEFT JOIN content c USING (doc_id)
  WHERE f.fetched AND p.allowed
    AND coalesce(c.content_chars, 0) >= {MIN_CONTENT_CHARS}
),
egroups AS (
  SELECT u.canonical_url, min(u.doc_id) AS _kid
  FROM urlsq u JOIN eligible e USING (doc_id)
  GROUP BY u.canonical_url
),
keepu AS (
  SELECT u.doc_id,
         coalesce(u.doc_id = g._kid, FALSE) AS keep_url
  FROM urlsq u LEFT JOIN egroups g USING (canonical_url)
)
SELECT f.doc_id, f.fetched, p.allowed, c.content_chars, k.keep_url,
       CASE WHEN NOT f.fetched THEN 'torn'
            WHEN NOT p.allowed THEN 'blocked'
            WHEN coalesce(c.content_chars, 0) < {MIN_CONTENT_CHARS}
              THEN 'thin'
            WHEN NOT k.keep_url THEN 'url_dup'
            ELSE 'kept' END AS verdict
FROM fetched f
JOIN policy p USING (doc_id)
JOIN keepu k USING (doc_id)
LEFT JOIN content c USING (doc_id)
"""

CRAWL_FUNNEL_REPORT_ORACLE = f"""
SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs
FROM {_subq(CRAWL_FUNNEL_ORACLE)}
GROUP BY verdict
"""


# Round-11 rotation (VERDICT r10 #4): the composed crawl-ingest
# capstone takes a registry slot (funded by q_psi_drift, whose drift
# sibling q_ks_drift stays registered) — the report composes
# B121+B122+B123+B124+B125 under one driver-grade hash check, the
# per-doc verdict relation stays on the unregistered surface with the
# identical composed oracle.
CRAWL_QUERIES = {"q_crawl_funnel_report": q_crawl_funnel_report}
CRAWL_ORACLES = {"q_crawl_funnel_report": CRAWL_FUNNEL_REPORT_ORACLE}

UNREGISTERED_CRAWL_QUERIES = {
    "q_crawl_funnel": q_crawl_funnel,
}
UNREGISTERED_CRAWL_ORACLES = {
    "q_crawl_funnel": CRAWL_FUNNEL_ORACLE,
}


# --------------------------------------------------------------------
# Streaming closure: the live crawl front door. A micro-batch of WARC
# files arrives per trigger; each batch runs the SAME verdict chain as
# q_crawl_funnel — framing (the page's URL is the response record's
# WARC-Target-URI, the production shape, not a synthesized column) →
# robots policy → extraction/thin gate → INCREMENTAL URL dedup against
# the persisted canonical index — and the kept pages land in out_path
# while their canonicals append to the index, both under ONE unit whose
# marker commits LAST (the dedup_stream_writer transaction: a crash
# anywhere before the marker leaves directories no reader resolves; an
# ever-published unit label skips everything on replay).

import os as _os

from pyspark.sql import functions as _F

from ..sources import commit_protocol as _cp
from .urls import incremental_url_dedup


def crawl_batch_ingest(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    rules: DataFrame,
    index_path: str,
    out_path: str,
    effect_hook=None,
) -> None:
    """One trigger of the live crawl front door (the foreachBatch body
    of ``crawl_stream_writer``, module-level so the day-2 crash matrix
    can drive it directly — the ``day2_ingest_writer`` discipline).

    ``effect_hook(stage, batch_id)`` is a FAULT-INJECTION point called
    after each durable effect, in order: ``kept_written`` (the
    kept-pages parquet landed), ``canon_written`` (the index's
    canonical unit landed) — the marker rename is last and needs no
    hook after it (a replay of a published unit is the existing
    ever-published no-op guard). A hook that raises simulates a crash
    at exactly that seam; replaying the same batch id afterwards must
    converge to the never-crashed state (tests/test_crawl_funnel.py)."""
    from .html_extract import extract_main_content as _extract
    from .robots import robots_filter as _robots
    from .urls import canonicalize_urls as _canon
    from .warc import warc_records as _records

    unit = f"b{batch_id:06d}"
    names, superseded = _cp.marker_state(index_path)
    if unit in names or unit in superseded:
        return  # effects fully published; replay is a no-op
    recs = _records(batch_df)
    # the byte-level parse feeds four consumers (policy, content,
    # eligible's base, and the verdicts' canonicalization) — pin it
    # once per batch instead of re-running the Arrow pass each time
    resp = recs.filter(
        (_F.col("warc_type") == "response") & _F.col("error").isNull()
    ).select("doc_id", _F.col("target_uri").alias("url"),
             _F.col("body").alias("html")).persist()
    policy = _robots(
        _canon(resp.select("doc_id", "url")).select(
            "doc_id", "canonical_url"
        ),
        rules,
    ).select("doc_id", "allowed")
    content = _extract(resp.select("doc_id", "html")).select(
        "doc_id", "content", "content_chars"
    )
    eligible = (
        resp.select("doc_id", "url")
        .join(policy, "doc_id")
        .join(content, "doc_id")
        .filter(
            _F.col("allowed")
            & (_F.col("content_chars") >= MIN_CONTENT_CHARS)
        )
    )
    verdicts = incremental_url_dedup(
        spark, eligible.select("doc_id", "url"), index_path,
        exclude_unit=unit,
    )
    kept = eligible.join(
        verdicts.filter(_F.col("status") == "kept").select(
            "doc_id", "canonical_url"
        ),
        "doc_id",
    ).persist()
    try:
        kept.select("doc_id", "url", "content").write.mode(
            "overwrite"
        ).parquet(_os.path.join(out_path, f"unit={unit}"))
        if effect_hook is not None:
            effect_hook("kept_written", batch_id)
        kept.select(
            "canonical_url", _F.col("doc_id").alias("canonical_id")
        ).write.mode("overwrite").parquet(
            _os.path.join(index_path, "canon", f"unit={unit}")
        )
        if effect_hook is not None:
            effect_hook("canon_written", batch_id)
        _cp.commit_unit(index_path, unit)
    finally:
        kept.unpersist()
        resp.unpersist()


def crawl_stream_writer(
    spark: SparkSession,
    warc_stream: DataFrame,
    rules: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
):
    """foreachBatch writer over a streaming (doc_id, warc binary)
    relation: verdicts per page (torn/blocked/thin/url_dup/kept), kept
    pages (doc_id, url, content) land under ``out_path/unit=<b>`` and
    their canonical URLs append to the index as the SAME unit —
    exactly-once via the marker-last protocol + the ever-published
    guard. ``rules`` is the static robots relation (host, rule_type,
    prefix). Returns the configured writeStream."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        crawl_batch_ingest(
            spark, batch_df, batch_id, rules, index_path, out_path
        )

    return (
        warc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )


def read_crawled(
    spark: SparkSession, out_path: str, index_path: str
) -> DataFrame:
    """The kept-pages corpus over COMMITTED units only (the index's
    markers govern out_path too — one marker per unit covers both
    stores, so out can never serve a unit the index hasn't published)."""
    units = [
        u
        for u in _cp.committed_units(index_path)
        if _os.path.isdir(_os.path.join(out_path, f"unit={u}"))
    ]
    if not units:
        return spark.createDataFrame(
            [], "doc_id long, url string, content string"
        )
    return spark.read.schema("doc_id long, url string, content string").parquet(
        *[_os.path.join(out_path, f"unit={u}") for u in units]
    )
