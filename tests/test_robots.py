"""robots.txt parsing + crawl-policy filtering (B124,
``operators/robots.py``).

Driver-grade DuckDB parity over the WHOLE pipeline (URL synthesis +
robots synthesis + group-tracked parse + longest-match verdict — all
synthesis strings shared verbatim), hand-built robots files for the
group tracker, and per-rule golden verdicts for the RFC 9309
longest-match / allow-on-tie / no-match semantics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.robots import (
    ROBOTS_FILTER_ORACLE,
    parse_robots_rules,
    q_robots_filter,
    robots_filter,
    synthesize_robots,
)

from .oracle_utils import compare, duckdb_con


def test_robots_filter_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(q_robots_filter(spark, sf_dir), con, ROBOTS_FILTER_ORACLE)
    finally:
        con.close()


def test_parse_robots_group_tracking(spark):
    txt = (
        "User-agent: googlebot\n"
        "Disallow: /google-only\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow:\n"          # empty value: matches nothing, dropped
        "User-agent: badbot\n"
        "Disallow: /\n"
    )
    robots = spark.createDataFrame([("h.com", txt)], "host string, robots string")
    rules = {
        (r["rule_type"], r["prefix"])
        for r in parse_robots_rules(robots).collect()
    }
    # only the '*' group's non-empty rules survive: googlebot's and
    # badbot's groups are ignored, the empty Disallow is dropped
    assert rules == {("Disallow", "/private"), ("Allow", "/private/ok")}


def test_parse_robots_stacked_user_agent_run(spark):
    # RFC 9309 §2.1: CONSECUTIVE User-agent lines share the rule block
    # that follows — '*' stacked under googlebot must still receive
    # /shared; a last-UA-wins tracker would bind it to '*'... or lose
    # it depending on order, so both orders are pinned
    txt = (
        "User-agent: googlebot\n"
        "User-agent: *\n"
        "Disallow: /shared\n"
        "User-agent: *\n"
        "User-agent: badbot\n"
        "Disallow: /also-starred\n"
        "User-agent: badbot\n"
        "Disallow: /bad-only\n"
    )
    robots = spark.createDataFrame([("h.com", txt)], "host string, robots string")
    star = {
        (r["rule_type"], r["prefix"])
        for r in parse_robots_rules(robots).collect()
    }
    assert star == {("Disallow", "/shared"), ("Disallow", "/also-starred")}
    bad = {
        (r["rule_type"], r["prefix"])
        for r in parse_robots_rules(robots, agent="badbot").collect()
    }
    assert bad == {("Disallow", "/also-starred"), ("Disallow", "/bad-only")}


def test_robots_filter_golden_verdicts(spark):
    rules = spark.createDataFrame(
        [
            ("h.com", "Disallow", "/news"),
            ("h.com", "Allow", "/news/good"),
            ("h.com", "Allow", "/tie"),
            ("h.com", "Disallow", "/tie"),
        ],
        "host string, rule_type string, prefix string",
    )
    urls = spark.createDataFrame(
        [
            (1, "http://h.com/news/bad"),     # Disallow /news wins
            (2, "http://h.com/news/good"),    # longer Allow overrides
            (3, "http://h.com/tie"),          # equal length: Allow wins
            (4, "http://h.com/elsewhere"),    # no rule matches: allowed
            (5, "http://other.com/news/bad"), # host without rules: allowed
        ],
        "doc_id long, canonical_url string",
    )
    out = {r["doc_id"]: r for r in robots_filter(urls, rules).collect()}
    assert not out[1]["allowed"] and out[1]["winner_prefix"] == "/news"
    assert out[2]["allowed"] and out[2]["winner_prefix"] == "/news/good"
    assert out[3]["allowed"] and out[3]["winner_type"] == "Allow"
    assert out[4]["allowed"] and out[4]["winner_type"] is None
    assert out[5]["allowed"] and out[5]["winner_type"] is None


def test_robots_filter_planted_sites(spark, sf_dir):
    rows = q_robots_filter(spark, sf_dir).collect()
    assert rows
    by_site = {}
    for r in rows:
        by_site.setdefault(r["host"].split(".")[0], []).append(r)
    # site 0: Disallow / blocks everything; site 1: empty Disallow
    # allows everything
    assert all(not r["allowed"] for r in by_site["site0"])
    assert all(r["allowed"] for r in by_site["site1"])
    # site 2's longest-match trap: item-12 matches Disallow
    # /news/item-1 AND Allow /news/item-12 — the longer Allow wins
    traps = [r for r in by_site.get("site2", []) if r["path"] == "/news/item-12"]
    for r in traps:
        assert r["allowed"] and r["winner_prefix"] == "/news/item-12"
    # site 4: only item-14 is blocked
    for r in by_site.get("site4", []):
        assert r["allowed"] == (r["path"] != "/news/item-14")


def test_robots_filter_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_robots_filter(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_robots_filter(spark, sf_dir).collect()))
    assert a == b


def test_synthesized_robots_shape(spark):
    texts = {r["host"]: r["robots"] for r in synthesize_robots(spark).collect()}
    assert len(texts) == 5
    for host, txt in texts.items():
        assert txt.startswith("User-agent: *\n")
        assert (
            "User-agent: badbot\nUser-agent: otherbot\nDisallow: /" in txt
        )
