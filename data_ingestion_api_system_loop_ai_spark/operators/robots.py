"""robots.txt parsing + crawl-policy filtering — B124.

The third ingest-side stage beside WARC framing (B122) and URL
canonicalization (B123): respectful web corpora (C4 famously) honor
robots exclusion. Semantics implemented are the REP as standardized in
RFC 9309 (formerly the Google spec):

- a robots.txt is LINE-GROUPED: CONSECUTIVE ``User-agent:`` lines
  form one group (RFC 9309 §2.1 stacking) and the ``Allow:``/
  ``Disallow:`` lines that follow belong to ALL of them — rules from
  groups for other agents are ignored entirely;
- per URL, the matching rule with the LONGEST path prefix wins
  (``Disallow: /news`` loses to ``Allow: /news/item-12`` on
  ``/news/item-12``, even though both match);
- on equal length, ``Allow`` wins (RFC 9309 §2.2.2 "least restrictive
  rule");
- an EMPTY ``Disallow:`` value matches nothing (the canonical
  "allow everything" idiom);
- a URL matching no rule is allowed.

Spark shape, and why it holds at 100 TB: group tracking is the
running-max idiom (each rule line's group = the last ``User-agent``
line position above it — one window per HOST-sized partition, robots
files are KB-sized so the partition is tiny by construction), rule
matching is an equi-join on host with the prefix test as a residual
(rule sets per host are bounded — the join fans out per-URL by rule
count, not corpus size), and the winner is a max(struct(...)) argmax,
never a window over the corpus. All JVM expressions; zero Python.

Fixtures: per-host robots.txt TEXT is synthesized in SQL from the
site-id space of B123's URLs (a wildcard group with longest-match
traps planted — ``Disallow: /news/item-1`` vs ``Allow:
/news/item-12`` — an empty-Disallow host, a disallow-all host, and a
``badbot`` group that must be IGNORED), with the synthesis string
shared verbatim by both engines — the whole operator, parsing
included, carries driver-grade DuckDB parity; per-rule goldens in the
direct tests.

Reference parity: none (no crawling in the 412-LoC reference);
BASELINE.json north-star tier ("text pipeline ingest" at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.loader import load_table
from .urls import URL_CANON_CTE, canonicalize_urls, synthesize_urls

AGENT = "*"

# robots.txt synthesis per host — ONE SQL expression string shared
# verbatim by both engines. {site} is an int column reference (0..4,
# B123's site-id space). Planted semantics per site:
#   site 0: disallow-all            (Disallow: /)
#   site 1: allow-all               (empty Disallow value)
#   site 2: longest-match trap      (Disallow: /news/item-1,
#           Allow: /news/item-12 — item-12/item-1x resolve by length)
#   site 3: equal-length tie        (Allow and Disallow on the same
#           prefix — Allow must win)
#   site 4: plain prefix block      (Disallow: /news/item-14 — item
#           ids on site 4 are ≡ 4 mod 5, so 14 really occurs there)
# every host also carries a trailing STACKED group (badbot AND
# otherbot sharing one Disallow — the RFC 9309 §2.1 consecutive-UA
# form), which a correct group-tracker ignores for agent '*' while
# binding the rule to BOTH stacked agents.
# Documented out of scope (fixtures contain none): '*'/'$' wildcards
# inside rule paths (§2.2.3), case-insensitive directive names, and
# comment stripping.
ROBOTS_SQL = (
    "concat("
    "'User-agent: *', chr(10),"
    "CASE {site} "
    "WHEN 0 THEN 'Disallow: /' "
    "WHEN 1 THEN 'Disallow:' "
    "WHEN 2 THEN concat('Disallow: /news/item-1', chr(10),"
    " 'Allow: /news/item-12') "
    "WHEN 3 THEN concat('Disallow: /news/item-3', chr(10),"
    " 'Allow: /news/item-3') "
    "ELSE 'Disallow: /news/item-14' END,"
    "chr(10),"
    "'User-agent: badbot', chr(10), 'User-agent: otherbot', chr(10),"
    " 'Disallow: /'"
    ")"
)


def synthesize_robots(spark: SparkSession) -> DataFrame:
    """(host, robots): one robots.txt per B123 site."""
    sites = spark.range(5).select(F.col("id").cast("int").alias("site"))
    return sites.select(
        F.concat(
            F.lit("site"), F.col("site").cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.expr(ROBOTS_SQL.format(site="site")).alias("robots"),
    )


def parse_robots_rules(robots: DataFrame, agent: str = AGENT) -> DataFrame:
    """(host, rule_type, prefix): the rules of ``agent``'s group(s) in
    each host's robots.txt.

    Group tracking is RUN-based per RFC 9309 §2.1: CONSECUTIVE
    ``User-agent`` lines share the rule block that follows (the
    standard ``User-agent: a\\nUser-agent: b\\nDisallow: /x`` stacking
    — a last-UA-line-wins tracker would bind the rules to ``b`` only).
    Implementation: a UA line STARTS a run iff the previous line is
    not a UA line (lag); every line's run id is the running max of run
    starts; rules join to ALL agent names of their run. Both windows
    partition by HOST over a KB-sized robots file — never
    corpus-sized — and port to the DuckDB twin verbatim."""
    lines = robots.select(
        "host",
        F.posexplode(F.split("robots", "\n")).alias("pos", "line"),
    )
    ua = F.regexp_extract("line", "^User-agent: *(.*)$", 1)
    tagged = lines.select(
        "host", "pos", "line",
        F.when(ua != "", ua).alias("ua"),
    )
    wseq = W.partitionBy("host").orderBy("pos")
    wrun = wseq.rowsBetween(W.unboundedPreceding, W.currentRow)
    # two projections — a window function may not nest inside another
    grp = (
        tagged.withColumn(
            "_prev_ua", F.lag(F.col("ua").isNotNull(), 1, False).over(wseq)
        )
        .withColumn(
            "_run_start",
            F.when(
                F.col("ua").isNotNull() & ~F.col("_prev_ua"), F.col("pos")
            ),
        )
        .withColumn("run_id", F.max("_run_start").over(wrun))
    )
    ua_names = grp.filter(F.col("ua").isNotNull()).select(
        "host", "run_id", "ua"
    )
    rule_type = F.regexp_extract("line", "^(Allow|Disallow): *", 1)
    prefix = F.regexp_extract("line", "^(Allow|Disallow): *(.*)$", 2)
    return (
        grp.drop("ua").join(ua_names, ["host", "run_id"])
        .filter((F.col("ua") == agent) & (rule_type != ""))
        .select(
            "host",
            rule_type.alias("rule_type"),
            prefix.alias("prefix"),
        )
        # the empty-Disallow idiom matches nothing: drop it here so the
        # matcher needs no special case (an empty Allow is equally void)
        .filter(F.col("prefix") != "")
        # a duplicated agent line inside one run must not duplicate its
        # rules
        .dropDuplicates(["host", "rule_type", "prefix"])
    )


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """(doc_id, canonical_url, host, path, winner_type, winner_prefix,
    allowed): RFC 9309 longest-match / allow-on-tie verdict per URL.
    Equi-join on host (rule sets are per-host bounded), argmax via
    max(struct(prefix_len, allow_bit)) — no corpus-sized window."""
    parts = urls.select(
        "doc_id",
        "canonical_url",
        F.expr(
            "regexp_extract(canonical_url, '^[a-z]+://([^/:]+)', 1)"
        ).alias("host"),
        F.expr(
            "regexp_extract(canonical_url, '^[a-z]+://[^/]+([^?#]*)', 1)"
        ).alias("path"),
    )
    matched = (
        parts.join(rules, "host", "left")
        .withColumn(
            "_hit",
            F.col("prefix").isNotNull()
            & (F.expr("substr(path, 1, length(prefix))") == F.col("prefix")),
        )
    )
    best = F.max(
        F.when(
            F.col("_hit"),
            F.struct(
                F.length("prefix").alias("plen"),
                (F.col("rule_type") == "Allow").cast("int").alias("abit"),
                F.col("rule_type").alias("rtype"),
                F.col("prefix").alias("rprefix"),
            ),
        )
    ).alias("b")
    agg = matched.groupBy("doc_id", "canonical_url", "host", "path").agg(best)
    return agg.select(
        "doc_id",
        "canonical_url",
        "host",
        "path",
        F.col("b.rtype").alias("winner_type"),
        F.col("b.rprefix").alias("winner_prefix"),
        F.when(F.col("b").isNull(), F.lit(True))
        .otherwise(F.col("b.rtype") == "Allow")
        .alias("allowed"),
    )


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-policy verdict for every B123 canonical URL against its
    host's robots.txt. (Unregistered — 50-slot cap; driver-grade
    DuckDB parity over the WHOLE pipeline — URL synthesis, robots
    synthesis, group-tracked parse, longest-match verdict — plus
    per-rule goldens in tests/test_robots.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = canonicalize_urls(synthesize_urls(docs)).select(
        "doc_id", "canonical_url"
    )
    return robots_filter(urls, parse_robots_rules(synthesize_robots(spark)))


# DuckDB twin — same synthesis strings (the URL chain arrives whole
# via URL_CANON_CTE), same running-max group tracking, same argmax
# struct field order. DuckDB zips parallel unnests, giving the line
# position without WITH ORDINALITY.
ROBOTS_FILTER_ORACLE = URL_CANON_CTE + f""",
sites AS (SELECT CAST(range AS INT) AS site FROM range(5)),
robots AS (
  SELECT 'site' || cast(site as string) || '.example.com' AS host,
         {ROBOTS_SQL.format(site="site")} AS robots
  FROM sites
),
lines AS (
  SELECT host,
         unnest(range(0, len(string_split(robots, chr(10))))) AS pos,
         unnest(string_split(robots, chr(10))) AS line
  FROM robots
),
tagged AS (
  SELECT host, pos, line,
         CASE WHEN regexp_extract(line, '^User-agent: *(.*)$', 1) <> ''
              THEN regexp_extract(line, '^User-agent: *(.*)$', 1) END AS ua
  FROM lines
),
runs AS (
  SELECT host, pos, line, ua,
         CASE WHEN ua IS NOT NULL AND NOT coalesce(
                lag(ua IS NOT NULL) OVER (PARTITION BY host ORDER BY pos),
                FALSE)
              THEN pos END AS _run_start
  FROM tagged
),
grp AS (
  SELECT host, pos, line, ua,
         max(_run_start) OVER (
           PARTITION BY host ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM runs
),
ua_names AS (
  SELECT host, run_id, ua FROM grp WHERE ua IS NOT NULL
),
rules AS (
  SELECT DISTINCT g.host,
         regexp_extract(g.line, '^(Allow|Disallow): *', 1) AS rule_type,
         regexp_extract(g.line, '^(Allow|Disallow): *(.*)$', 2) AS prefix
  FROM grp g JOIN ua_names n USING (host, run_id)
  WHERE n.ua = '{AGENT}'
    AND regexp_extract(g.line, '^(Allow|Disallow): *', 1) <> ''
    AND regexp_extract(g.line, '^(Allow|Disallow): *(.*)$', 2) <> ''
),
uparts AS (
  SELECT doc_id, canonical_url,
         regexp_extract(canonical_url, '^[a-z]+://([^/:]+)', 1) AS host,
         regexp_extract(canonical_url, '^[a-z]+://[^/]+([^?#]*)', 1) AS path
  FROM canon
),
matched AS (
  SELECT p.doc_id, p.canonical_url, p.host, p.path,
         r.rule_type, r.prefix,
         r.prefix IS NOT NULL
           AND substr(p.path, 1, length(r.prefix)) = r.prefix AS _hit
  FROM uparts p LEFT JOIN rules r USING (host)
),
agg AS (
  SELECT doc_id, canonical_url, host, path,
         max(CASE WHEN _hit THEN {{'plen': length(prefix),
             'abit': CASE WHEN rule_type = 'Allow' THEN 1 ELSE 0 END,
             'rtype': rule_type, 'rprefix': prefix}} END) AS b
  FROM matched
  GROUP BY doc_id, canonical_url, host, path
)
SELECT doc_id, canonical_url, host, path,
       b.rtype AS winner_type, b.rprefix AS winner_prefix,
       CASE WHEN b IS NULL THEN TRUE ELSE b.rtype = 'Allow' END AS allowed
FROM agg
"""


UNREGISTERED_ROBOTS_QUERIES = {"q_robots_filter": q_robots_filter}
UNREGISTERED_ROBOTS_ORACLES = {"q_robots_filter": ROBOTS_FILTER_ORACLE}
