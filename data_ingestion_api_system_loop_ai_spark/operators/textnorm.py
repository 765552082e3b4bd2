"""Unicode text normalization — B128.

The cleanup pass every web corpus runs between extraction and
analysis (the deterministic core of the ftfy / C4-cleanup layer):
crawled text arrives with non-breaking spaces, zero-width characters,
curly quotes, long dashes, stray C0 controls and CRLF line endings —
all of which poison exact dedup (two visually identical paragraphs
hash apart on a ZWSP), token counting, and shingling. The ladder:

1. one ``translate()`` pass (single-codepoint maps and deletes):
   C0 controls except \\n/\\t deleted (CR deleted — CRLF becomes LF),
   DEL deleted; zero-widths (ZWSP/ZWNJ/ZWJ/ZWNBSP-BOM) deleted;
   NBSP and TAB -> space; curly single/double quotes -> ASCII;
   en/em dash -> hyphen;
2. ellipsis (U+2026) -> ``...`` (the one 1:n rewrite, a plain
   ``replace``);
3. space runs collapsed to one space;
4. 3+ newline runs collapsed to a paragraph break (two);
5. trim.

Spark shape: the WHOLE ladder is one codegen projection — zero
shuffles, zero Python. The character tables are built ONCE in Python
as ``concat(chr(...), ...)`` expressions, so the heavy constants are
shared verbatim between the engines; the only per-engine spelling is
DuckDB's ``'g'`` flag on regexp_replace (Spark replaces all matches
by default — the B121 oracle convention).

Fixtures: mess is synthesized IN SQL around the documents text
(NBSP-joined words, curly-quoted spans, em-dashes, zero-widths
INSIDE a word, a BEL control, CRLF, double spaces — all planted by
doc_id residue with the synthesis string shared verbatim), so the
whole operator carries driver-grade DuckDB parity; golden strings pin
each rule, and an idempotence test pins normalize(normalize(x)) ==
normalize(x).

Reference parity: none; BASELINE.json north-star tier ("text
analysis" at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

# single-codepoint rewrite table: (from_codepoint, to_codepoint|None)
# None = delete. Order irrelevant (translate is per-char).
_CHAR_MAP: list[tuple[int, int | None]] = (
    # C0 controls except TAB(9)/LF(10); CR deleted -> CRLF becomes LF
    [(c, None) for c in range(0, 32) if c not in (9, 10)]
    + [
        (0x7F, None),    # DEL
        (0x200B, None),  # ZWSP
        (0x200C, None),  # ZWNJ
        (0x200D, None),  # ZWJ
        (0xFEFF, None),  # ZWNBSP / stray BOM
        (0xA0, 0x20),    # NBSP -> space
        (9, 0x20),       # TAB -> space (then runs collapse)
        (0x2018, 0x27),  # ' -> '
        (0x2019, 0x27),  # ' -> '
        (0x201C, 0x22),  # " -> "
        (0x201D, 0x22),  # " -> "
        (0x2013, 0x2D),  # en dash -> -
        (0x2014, 0x2D),  # em dash -> -
    ]
)
# translate() deletes chars of FROM beyond len(TO): mapped pairs must
# come first, deletions last
_MAPPED = [(f, t) for f, t in _CHAR_MAP if t is not None]
_DELETED = [f for f, t in _CHAR_MAP if t is None]


def _sql_char(cp: int) -> str:
    # Spark's chr() is mod-256 (ASCII/Latin-1 only; chr(8216) silently
    # becomes chr(40)!) while DuckDB's is full Unicode — so codepoints
    # above 255 are embedded as RAW literal characters, which both
    # parsers accept identically; low codepoints (incl. controls) stay
    # chr() so the source file carries no invisible bytes
    return f"chr({cp})" if cp < 256 else "'" + chr(cp) + "'"


FROM_SQL = "concat(" + ",".join(
    _sql_char(f) for f, _t in _MAPPED + [(d, None) for d in _DELETED]
) + ")"
TO_SQL = "concat(" + ",".join(_sql_char(t) for _f, t in _MAPPED) + ")"
_ELLIPSIS = _sql_char(0x2026)


def norm_sql(x: str, engine: str) -> str:
    """The ladder as one SQL expression over column ``x``. Identical
    text both engines; DuckDB regexp_replace needs the 'g' flag."""
    g = ", 'g'" if engine == "duck" else ""
    t1 = f"translate({x}, {FROM_SQL}, {TO_SQL})"
    t2 = f"replace({t1}, {_ELLIPSIS}, '...')"
    t3 = f"regexp_replace({t2}, ' +', ' '{g})"
    t4 = f"regexp_replace({t3}, chr(10) || '{{3,}}', chr(10) || chr(10){g})"
    return f"trim({t4})"


# mess synthesis — shared verbatim ({text}/{doc_id} are column refs):
# every rule's trigger is planted by residue. High codepoints go
# through _sql_char (raw literals — Spark's chr() is mod-256).
MESSY_SQL = (
    "concat("
    "CASE {doc_id} % 5 WHEN 0 THEN concat(" + _sql_char(0x201C)
    + ", 'quoted', " + _sql_char(0x201D)
    + ", chr(160), 'lead', " + _sql_char(0x2019)
    + ", 's', chr(13), chr(10)) ELSE '' END,"
    "CASE {doc_id} % 3 WHEN 0 THEN concat('zero', " + _sql_char(0x200B)
    + ", 'width', chr(9), 'tabbed  doubled ') ELSE '' END,"
    "{text},"
    "CASE {doc_id} % 4 WHEN 0 THEN concat(' trailing', " + _sql_char(0x2014)
    + ", 'dash', " + _sql_char(0x2026)
    + ", chr(7), chr(10), chr(10), chr(10), chr(10),"
    " 'after-gap') ELSE '' END"
    ")"
)


def normalize_text(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds ``text_norm``, ``n_before``, ``n_after`` to ``df``."""
    return df.withColumn(
        "text_norm", F.expr(norm_sql(col, "spark"))
    ).withColumn("n_before", F.length(col).cast("long")).withColumn(
        "n_after", F.length("text_norm").cast("long")
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text_norm, n_before, n_after) over messy synthesized
    text. (Unregistered — 50-slot cap; driver-grade DuckDB parity over
    the WHOLE pipeline, synthesis included, plus per-rule goldens and
    an idempotence pin in tests/test_textnorm.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    messy = docs.select(
        "doc_id",
        F.expr(MESSY_SQL.format(doc_id="doc_id", text="text")).alias("text"),
    )
    return normalize_text(messy).select(
        "doc_id", "text_norm", "n_before", "n_after"
    )


TEXT_NORMALIZE_ORACLE = f"""
WITH messy AS (
  SELECT doc_id,
         {MESSY_SQL.format(doc_id="doc_id", text="text")} AS text
  FROM documents
)
SELECT doc_id,
       {norm_sql("text", "duck")} AS text_norm,
       CAST(length(text) AS BIGINT) AS n_before,
       CAST(length({norm_sql("text", "duck")}) AS BIGINT) AS n_after
FROM messy
"""


UNREGISTERED_TEXTNORM_QUERIES = {"q_text_normalize": q_text_normalize}
UNREGISTERED_TEXTNORM_ORACLES = {"q_text_normalize": TEXT_NORMALIZE_ORACLE}
