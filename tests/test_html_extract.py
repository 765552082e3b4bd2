"""HTML boilerplate extraction (B121, ``operators/html_extract.py``).

Driver-grade DuckDB parity over the WHOLE pipeline (synthesis included
— the page SQL string is shared verbatim by both engines), plus
hand-built golden pages that exercise the density classifier's edges:
an all-links page (everything dropped), a no-boilerplate page
(everything kept), an empty-body block, and a link-exactly-at-the-
threshold block.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.html_extract import (
    HTML_EXTRACT_ORACLE,
    LINK_DENSITY_MAX,
    MIN_WORDS,
    extract_main_content,
    q_html_extract,
    synthesize_pages,
)

from .oracle_utils import compare, duckdb_con


def test_html_extract_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(q_html_extract(spark, sf_dir), con, HTML_EXTRACT_ORACLE)
    finally:
        con.close()


def test_html_extract_drops_planted_boilerplate(spark, sf_dir):
    rows = q_html_extract(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the synthesized page plants 7 blocks: h1 + body-p (content)
        # and nav / share-p / aside / related / footer (boilerplate)
        assert r["n_blocks"] == 7
        assert r["n_kept"] == 2
        c = r["content"]
        assert "Home" not in c and "Sponsored" not in c
        assert "Twitter" not in c and "Related story" not in c
        assert "copyright" not in c
        assert r["content_chars"] > 0 and r["boiler_chars"] > 0
        assert 0.0 < r["content_ratio"] < 1.0
    # the kept content is title + body in DOCUMENT ORDER: the body text
    # starts with the title's three tokens, so content = title + ' ' + body
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows[:20]:
        body = texts[r["doc_id"]]
        title = " ".join(body.split(" ")[:3])
        assert r["content"] == f"{title} {body}"


def test_html_extract_golden_pages(spark):
    pages = spark.createDataFrame(
        [
            # all links, no prose: every block dropped
            (
                1,
                '<html><body><nav><a href="/">x</a></nav>'
                '<p><a href="#">one</a> <a href="#">two</a> '
                '<a href="#">three</a></p></body></html>',
            ),
            # clean article, zero links: everything kept
            (
                2,
                "<html><body><h1>big clean title</h1>"
                "<p>plain prose with many honest words here</p>"
                "</body></html>",
            ),
            # empty paragraph + sub-threshold word count
            (
                3,
                "<html><body><p></p><p>two words</p>"
                "<p>three words here</p></body></html>",
            ),
            # script/style stripped before segmentation
            (
                4,
                "<html><head><script>var p = 1;</script>"
                "<style>.x {}</style></head><body>"
                "<p>real body text survives scripts</p></body></html>",
            ),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in extract_main_content(pages).collect()}
    assert out[1]["n_kept"] == 0 and out[1]["content"] == ""
    assert out[2]["n_kept"] == 2
    assert out[2]["content"] == (
        "big clean title plain prose with many honest words here"
    )
    assert out[2]["content_ratio"] == 1.0
    # doc 3: '' (0 words) and 'two words' (2 < MIN_WORDS) drop,
    # 'three words here' keeps
    assert out[3]["n_blocks"] == 3 and out[3]["n_kept"] == 1
    assert out[3]["content"] == "three words here"
    assert out[4]["n_kept"] == 1
    assert out[4]["content"] == "real body text survives scripts"
    assert MIN_WORDS == 3 and abs(LINK_DENSITY_MAX - 1 / 3) < 1e-12


def test_html_extract_threshold_edges(spark):
    # link density EXACTLY at 1/3 keeps (<=); just above drops. The
    # stripped text is 30 chars; the link body is 10 or 11 of them.
    base = "aaaa bbbb cccc dddd "  # 20 chars, 4 words
    at = f'<p>{base}<a href="#">male nurse</a></p>'      # 10/30
    above = f'<p>{base[:-1]}<a href="#">male nurses</a></p>'  # 11/30
    pages = spark.createDataFrame(
        [(1, f"<html><body>{at}{above}</body></html>")],
        "doc_id long, html string",
    )
    r = extract_main_content(pages).collect()[0]
    assert r["n_blocks"] == 2
    assert r["n_kept"] == 1
    assert r["content"].endswith("male nurse")


def test_html_extract_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_html_extract(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_html_extract(spark, sf_dir).collect()))
    assert a == b


def test_synthesized_pages_carry_planted_links(spark, sf_dir):
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    html = synthesize_pages(docs).first()["html"]
    for marker in (
        "<nav>", "<aside>", "<footer>", '<div class="related">',
        "<script>", "Twitter", "Sponsored",
    ):
        assert marker in html
