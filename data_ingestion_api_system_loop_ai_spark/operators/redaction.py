"""PII redaction for training corpora.

Corpus hygiene includes scrubbing personally identifiable information
before training: emails, phone-like digit runs, IPv4 addresses, and
long numeric identifiers. This module does it with JVM-side
``regexp_replace`` chains — no Python in the data path — and emits
per-document match counts alongside the scrubbed text so the pipeline
can audit redaction volume per source.

The patterns stay within the regex subset Java (Spark) and DuckDB's
RE2-style engine interpret identically: character classes, bounded
quantifiers, alternation — no backreferences, no lookaround. Order
matters: emails are scrubbed before digit runs so the local-part of
``a1234567@x.com`` is not half-eaten by the number rule.

Scale: a pure per-row projection — no shuffle, no state; predicate
pushdown and column pruning are unaffected. The synthetic corpus
contains no PII (no digits at all), so the registered-query path would
be a no-op; the operator is therefore API surface with a
constructed-data DuckDB parity test (`tests/test_unregistered_ops.py`)
instead of a registry slot — the same contract, same comparator, on
data that actually exercises every pattern.

The reference (an ingestion API) has no redaction surface; this module
belongs to the mandated LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
    ("number", r"[0-9]{6,}", "<NUM>"),
]


def redact_text(col: Column) -> Column:
    """The scrubbed text: every rule applied in order."""
    out = col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redaction_counts(col: Column) -> list[Column]:
    """Per-rule match counts, measured on the text AS THAT RULE SEES IT
    (after the earlier rules ran — the count a later auditor could
    reproduce from the scrub order)."""
    cols = []
    seen = col
    for name, pat, repl in PII_RULES:
        # idx=0 (full match): Spark defaults to group 1 and rejects
        # group-less patterns; DuckDB's default is already the full match
        cols.append(
            F.size(F.regexp_extract_all(seen, F.lit(pat), 0)).alias(f"n_{name}")
        )
        seen = F.regexp_replace(seen, pat, repl)
    return cols


def redact_pii(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub + audit any (key, text) relation: returns key, redacted
    text, and one match-count column per rule."""
    c = F.col(text_col)
    return df.select(
        F.col(key_col).alias("doc_id"),
        redact_text(c).alias("text_redacted"),
        *redaction_counts(c),
    )


def sql_redact_pii(table: str, key_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of ``redact_pii`` over ``table`` (same rule order,
    same count-on-intermediate semantics), for parity tests."""
    nested = text_col
    count_exprs = []
    seen = text_col
    for name, pat, repl in PII_RULES:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({seen}, '{pat}')) AS INTEGER)"
            f" AS n_{name}"
        )
        seen = f"regexp_replace({seen}, '{pat}', '{repl}', 'g')"
        nested = f"regexp_replace({nested}, '{pat}', '{repl}', 'g')"
    counts = ",\n       ".join(count_exprs)
    return f"""
SELECT {key_col} AS doc_id,
       {nested} AS text_redacted,
       {counts}
FROM {table}
"""
