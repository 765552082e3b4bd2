"""UDF surface (SURVEY.md B22): vectorized Pandas UDF + grouped
``applyInPandas`` — the sanctioned slow path for semantics the built-ins
can't express. Arrow-batched throughout; no row-at-a-time Python UDFs
anywhere in the engine (they exist only in ``bench.py`` as the
anti-pattern baseline).

The demo computes a per-event-type z-score with ``applyInPandas`` (the
moral equivalent of the reference's per-batch ``simulateApiCall``
enrichment, ``ingestService.js:42-50``, as a real vectorized transform)
and a scalar Pandas-UDF rescale. Both have exact SQL twins, so this
stays oracle-checkable (rounded to absorb summation-order ulps).

Scale note: grouped-map pandas UDFs pay a per-group Python/Arrow round
trip, so the group key must be COARSE — a handful of big Arrow batches
(here: 5 event types), never thousands of tiny groups (an earlier
per-user draft spent ~6 ms/group of pure overhead). High-cardinality
per-key math belongs in window functions or grouped aggregates, not
grouped-map.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

_Z_SCHEMA = "event_id long, event_type string, value double, z double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["value"].mean()
    std = pdf["value"].std(ddof=1)  # sample stddev = stddev_samp
    pdf = pdf[["event_id", "event_type", "value"]].copy()
    pdf["z"] = ((pdf["value"] - mean) / std).round(4)
    return pdf


def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (per-event-type z-score) + scalar
    pandas_udf (rescale). One shuffle on event_type; each group is one
    big Arrow batch, vectorized end-to-end inside pandas."""

    @F.pandas_udf("double")
    def rescale(s: pd.Series) -> pd.Series:
        return (s * 1.1).round(6)

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    z = ev.groupBy("event_type").applyInPandas(_zscore_group, _Z_SCHEMA)
    return z.withColumn("scaled", rescale(F.col("value")))


UDF_QUERIES = {"q_udf_surface": q_udf_surface}

UDF_ORACLES = {
    "q_udf_surface": """
SELECT event_id, event_type, value,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z,
       round(value * 1.1, 6) AS scaled
FROM events
""",
}


# --- B57: Python UDTF (unregistered; 50-slot cap) -----------------------

UDTF_DOCS = 100  # doc subset keeps the row-path demo test-sized


def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B57 — Spark 4 Python UDTF driven through SQL ``LATERAL``: emit
    (pos, token) rows per document, completing the Python surface
    (scalar pandas_udf, applyInPandas, mapInPandas, mapInArrow,
    applyInPandasWithState are covered elsewhere; UDTF is the
    table-valued form). The tokenizer mirrors ``functions.text.tokenize``
    exactly (lowercase, split on [^a-z0-9]+, drop empties), so the
    DuckDB oracle reproduces every (doc, pos, token) row.

    Scale note: Python UDTFs are ROW-path (one Python call per input
    row, pickled rows — no Arrow batching), so like row-at-a-time UDFs
    they stay off hot paths; in-row token explosion at scale is the
    JVM-side ``posexplode(tokenize(text))`` one line below in the plan
    lint's sights. This exists as sanctioned API surface for semantics
    that genuinely need per-row generators (recursive parsers, variable
    fan-out decoders), demonstrated on a bounded doc subset.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenizeUDTF:
        def eval(self, text: str):
            toks = [
                t
                for t in re.split(r"[^a-z0-9]+", (text or "").lower())
                if t
            ]
            for i, t in enumerate(toks, 1):
                yield i, t

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < UDTF_DOCS
    )
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )


UDTF_TOKENS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS tokens
  FROM documents WHERE doc_id < {UDTF_DOCS}
)
SELECT doc_id,
       unnest(list_transform(range(1, len(tokens) + 1),
              i -> {{'pos': CAST(i AS INTEGER), 'token': tokens[i]}}),
              recursive := true)
FROM toks
"""
