"""Text expression builders shared by the dedup / text-analysis operators.

Everything here is a pure JVM-side column expression (no Python UDFs) and
has an exact DuckDB twin so operators built from these are oracle-checkable:

- tokenize:      split on [^a-z0-9]+ after lowercasing, drop empties
- shingles_k:    word k-grams, distinct set
- token_hash32:  first 8 hex chars of md5 -> unsigned 32-bit int (engine-
                 portable stand-in for a 64-bit string hash; xxhash64 etc.
                 differ across engines)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SEP = "[^a-z0-9]+"

# Tiny per-language stopword lists for the lang-id heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "fr": ("le", "la", "et", "les", "des", "un", "une"),
    "es": ("el", "la", "y", "los", "de", "que", "un"),
    "de": ("der", "die", "und", "das", "ein", "zu", "ist"),
}


def tokenize(col) -> Column:
    """Lowercase word tokens; identical to DuckDB
    ``list_filter(regexp_split_to_array(lower(x),'[^a-z0-9]+'), t -> t <> '')``."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SEP), lambda t: t != F.lit("")
    )


def shingles_k(tokens: Column, k: int) -> Column:
    """Distinct word k-grams joined by single spaces (order-exact)."""
    joined = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + off) for off in range(k)]
    )
    return F.when(
        F.size(tokens) >= k,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(tokens) - k + 1), joined)
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_hash32(col) -> Column:
    """Unsigned 32-bit hash from md5 hex — portable across engines
    (DuckDB: ``('0x' || substr(md5(t),1,8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens in a fixed stopword list (with multiplicity)."""
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


# DuckDB twin of tokenize(), as a SQL fragment parameterized by column name.
def sql_tokens(col: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'),"
        " t -> t <> '')"
    )
