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
