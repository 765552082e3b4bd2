"""HTML main-content extraction (boilerplate removal) — B121.

The FIRST stage of every web-scale training pipeline (CommonCrawl WARC
→ text) is stripping navigation/ads/footers from markup; the published
recipe family is block-level text/link-density classification
(Kohlschütter et al. WSDM 2010, "Boilerplate Detection using Shallow
Text Features" — Boilerpipe; trafilatura descends from it). The engine
implements the density heuristic's core:

1. drop <script>/<style> wholesale;
2. segment the page into BLOCK-LEVEL text units (h1/p/nav/aside/
   footer/related-div);
3. per block: tag-stripped text, LINK DENSITY (chars inside <a> ÷
   block chars), word count;
4. keep blocks with link density <= 1/3 and >= 3 words (navigation,
   share bars, ad rails and footers are link-dense and short — the
   WSDM'10 observation); reassemble kept blocks in DOCUMENT ORDER.

Spark shape, and why it holds at 100 TB: everything is JVM string
functions (regexp_extract_all / regexp_replace / split) inside
whole-stage codegen — NO Python in the path; one narrow pass explodes
each page into its blocks, per-block metrics are scalar expressions,
and the reassembly is one groupBy on the page key with an
order-by-position aggregate. Linear, one shuffle, no UDFs.

Regex discipline: every pattern is char-class + non-greedy only — the
subset Java regex (Spark) and RE2 (DuckDB) evaluate identically; no
lookahead, no backreferences (RE2 has neither).

Fixtures: pages are synthesized IN SQL from the documents table (title
+ body from the doc text; nav/share-bar/aside/footer boilerplate with
planted links), so the whole operator — synthesis included — carries a
DuckDB oracle; the direct test also pins hand-built golden pages
(pathological: empty body, all-links page, no-boilerplate page).

Reference parity: none (no analytics in the 412-LoC reference);
BASELINE.json north-star tier ("text analysis" at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

LINK_DENSITY_MAX = 1.0 / 3.0
MIN_WORDS = 3

# block-level units extracted from the page; (label, extraction regex)
# — char-class + non-greedy only (Java == RE2 semantics)
BLOCK_PATTERNS = [
    ("h1", "<h1>(.*?)</h1>"),
    ("p", "<p>(.*?)</p>"),
    ("nav", "<nav>(.*?)</nav>"),
    ("aside", "<aside>(.*?)</aside>"),
    ("footer", "<footer>(.*?)</footer>"),
    ("related", '<div class="related">(.*?)</div>'),
]
SCRIPT_STYLE_RE = "<script>[^<]*</script>|<style>[^<]*</style>"
TAG_RE = "<[^>]*>"
LINK_RE = "<a[^>]*>(.*?)</a>"

# page synthesis — ONE SQL expression string shared verbatim by the
# Spark plan (F.expr) and the DuckDB oracle, so the fixture pages are
# identical by construction. {text}/{doc_id} are column references.
PAGE_SQL = (
    "concat("
    "'<html><head><title>', 'doc ', cast({doc_id} as string), '</title>',"
    "'<script>var x = 1;</script><style>.m [c] {{}}</style></head><body>',"
    "'<nav><a href=\"/\">Home</a> <a href=\"/news\">News</a> "
    "<a href=\"/about\">About</a></nav>',"
    "'<div id=\"main\"><h1>', {title}, '</h1>"
    "<p>', {text}, '</p>"
    "<p>Share: <a href=\"#t\">Twitter</a> <a href=\"#f\">Facebook</a></p>"
    "</div>',"
    "'<aside>Sponsored <a href=\"#a1\">Deal one</a> "
    "<a href=\"#a2\">Deal two</a></aside>',"
    "'<div class=\"related\"><a href=\"#r1\">Related story</a> "
    "<a href=\"#r2\">More stories</a></div>',"
    "'<footer>copyright 2026 example "
    "<a href=\"/tos\">Terms of service</a></footer>',"
    "'</body></html>')"
)
# the page title: the doc's first three tokens (regexp on the raw text)
TITLE_SQL = "regexp_extract({text}, '^([^ ]+ [^ ]+ [^ ]+)', 1)"


def synthesize_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, html): deterministic fixture pages from the documents
    table — title + body are the document's own text, the boilerplate
    is planted (nav / share bar / ad rail / related links / footer)."""
    title = TITLE_SQL.format(text="text")
    return docs.select(
        "doc_id",
        F.expr(
            PAGE_SQL.format(doc_id="doc_id", text="text", title=title)
        ).alias("html"),
    )


def extract_main_content(pages: DataFrame) -> DataFrame:
    """(doc_id, n_blocks, n_kept, content, content_chars, boiler_chars,
    content_ratio): the density-classified main content of each page in
    ``pages`` (doc_id, html)."""
    clean = pages.select(
        "doc_id",
        F.regexp_replace("html", SCRIPT_STYLE_RE, "").alias("html"),
    )
    per_tag = [
        F.expr(f"regexp_extract_all(html, '{pat}', 1)")
        for _label, pat in BLOCK_PATTERNS
    ]
    blocks = clean.select(
        "doc_id",
        "html",
        F.explode(F.flatten(F.array(*per_tag))).alias("block"),
    )
    stripped = F.regexp_replace("block", TAG_RE, "")
    link_chars = F.aggregate(
        F.transform(
            F.expr(f"regexp_extract_all(block, '{LINK_RE}', 1)"),
            lambda t: F.length(t),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    words = F.when(F.length(F.trim(stripped)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(stripped), " +"))
    )
    m = blocks.select(
        "doc_id",
        # document order: the block's byte position in the page (each
        # block string occurs once per page — the patterns are anchored
        # to distinct tags)
        F.expr("instr(html, block)").alias("pos"),
        stripped.alias("text"),
        F.length(stripped).alias("chars"),
        link_chars.alias("link_chars"),
        words.alias("words"),
    )
    keep = (
        F.col("link_chars")
        <= F.col("chars") * F.lit(LINK_DENSITY_MAX)
    ) & (F.col("words") >= MIN_WORDS)
    judged = m.select(
        "doc_id", "pos", "text", "chars", "link_chars", keep.alias("keep")
    )
    return judged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct("pos", "text"),
                        )
                    )
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("content"),
        F.sum(F.when(F.col("keep"), F.col("chars")).otherwise(0))
        .cast("long")
        .alias("content_chars"),
        F.sum(F.when(~F.col("keep"), F.col("chars")).otherwise(0))
        .cast("long")
        .alias("boiler_chars"),
        F.round(
            F.sum(F.when(F.col("keep"), F.col("chars")).otherwise(0))
            / F.greatest(
                F.sum("chars"), F.lit(1)
            ),
            6,
        ).alias("content_ratio"),
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal over synthesized pages keyed by the
    documents table. (Unregistered — 50-slot cap; driver-grade DuckDB
    parity over the WHOLE pipeline, synthesis included, plus hand-built
    golden pages in the direct tests.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_main_content(synthesize_pages(docs))


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


# DuckDB twin — same PAGE_SQL synthesis string, same regexes, same
# keep rule, string_agg ordered by block position.
HTML_EXTRACT_ORACLE = f"""
WITH pages AS (
  SELECT doc_id,
         {PAGE_SQL.format(doc_id="doc_id", text="text",
                          title=TITLE_SQL.format(text="text"))} AS html
  FROM documents
),
clean AS (
  SELECT doc_id,
         regexp_replace(html, '{_sql_quote(SCRIPT_STYLE_RE)}', '', 'g')
           AS html
  FROM pages
),
blocks AS (
  SELECT doc_id, html, unnest(
    {" || ".join(
        f"regexp_extract_all(html, '{_sql_quote(pat)}', 1)"
        for _l, pat in BLOCK_PATTERNS
    )}
  ) AS block
  FROM clean
),
metrics AS (
  SELECT doc_id,
         strpos(html, block) AS pos,
         regexp_replace(block, '{TAG_RE}', '', 'g') AS text,
         length(regexp_replace(block, '{TAG_RE}', '', 'g')) AS chars,
         coalesce(list_aggregate(list_transform(
             regexp_extract_all(block, '{_sql_quote(LINK_RE)}', 1),
             t -> length(t)), 'sum'), 0) AS link_chars
  FROM blocks
),
judged AS (
  SELECT *,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(list_filter(string_split_regex(trim(text), ' +'),
                                      w -> length(w) > 0)) END AS words,
         (link_chars <= chars * {LINK_DENSITY_MAX}
          AND (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE length(string_split_regex(trim(text), ' +')) END)
              >= {MIN_WORDS}) AS keep
  FROM metrics
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN keep THEN text END, ' '
                           ORDER BY pos), '') AS content,
       CAST(sum(CASE WHEN keep THEN chars ELSE 0 END) AS BIGINT)
         AS content_chars,
       CAST(sum(CASE WHEN NOT keep THEN chars ELSE 0 END) AS BIGINT)
         AS boiler_chars,
       round(sum(CASE WHEN keep THEN chars ELSE 0 END)
             / greatest(CAST(sum(chars) AS DOUBLE), 1), 6)
         AS content_ratio
FROM judged
GROUP BY doc_id
"""


UNREGISTERED_HTML_QUERIES = {"q_html_extract": q_html_extract}
UNREGISTERED_HTML_ORACLES = {"q_html_extract": HTML_EXTRACT_ORACLE}
