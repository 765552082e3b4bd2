"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus feeding a training run needs splits that are:

- DETERMINISTIC — re-running the pipeline (or re-reading after a
  failure) assigns every document to the same split; no RNG state, no
  ``rand()`` whose draw depends on partitioning;
- KEY-STABLE — a document keeps its split across corpus versions, so
  yesterday's validation document cannot leak into today's training
  set when the corpus grows (the reason splits hash a STABLE KEY, not
  a row position);
- SHUFFLE-FREE — assignment is a per-row projection; nothing moves.

``split_column`` hashes the key with the engine-portable md5 window
(same construction as the MinHash operators, so DuckDB or any other
engine reproduces the assignment bit-for-bit) and buckets the hash into
10_000 slots; split boundaries are cumulative per-mille-of-ten
fractions over those slots. ``deterministic_split`` materializes the
per-split DataFrames; ``deterministic_sample`` is the one-fraction
form. Both are API surface with direct tests (the driver registry is
capped at 50 slots).

The reference has no sampling surface (it is an ingestion API); this
module belongs to the mandated LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_SLOTS = 10_000


def _portable_hash_slot(key: Column) -> Column:
    """Engine-portable slot in [0, SPLIT_SLOTS): first 8 hex chars of
    md5 over the key's string form, mod the slot count. DuckDB twin:
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT % 10000``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % SPLIT_SLOTS
    )


def split_column(
    key: Column | str, fractions: dict[str, float], col_name: str = "split"
) -> Column:
    """A projection column assigning each row to a named split by the
    hash of ``key``. ``fractions`` maps split name -> fraction; they
    must sum to <= 1.0 (any remainder is assigned NULL — useful for
    'sample 1% train / 0.1% val, ignore the rest' pipelines).

    Assignment is by half-open slot ranges over the hashed key, so it
    is stable under corpus growth and identical on every engine that
    can compute md5."""
    if isinstance(key, str):
        key = F.col(key)
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    slot = _portable_hash_slot(key)
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * SPLIT_SLOTS))
        cond = (slot >= lo) & (slot < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr.otherwise(F.lit(None)).alias(col_name)


def deterministic_split(
    df: DataFrame, key: str, fractions: dict[str, float]
) -> dict[str, DataFrame]:
    """Materialize one DataFrame per named split. Each split is a
    filter over the same projection — Catalyst pushes the predicate to
    the scan, and no data moves until an action runs."""
    tagged = df.withColumn("split", split_column(key, fractions))
    return {
        name: tagged.filter(F.col("split") == name).drop("split")
        for name in fractions
    }


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Key-stable fraction sample: the same rows are selected on every
    run and on every engine (unlike ``df.sample``, whose selection
    depends on partition layout and RNG seed plumbing)."""
    return deterministic_split(df, key, {"s": fraction})["s"]
