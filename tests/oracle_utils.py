"""Local mirror of the driver's correctness gate: run the Spark query and
the DuckDB oracle side by side, compare row count + column names + an
order-insensitive multiset of stringified values (columns sorted by name,
floats rounded to 9 significant-ish decimals to absorb last-ulp noise)."""

from __future__ import annotations

import datetime
import math
import os
from collections import Counter

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    return str(v)


def compare(spark_df, con, sql: str) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive)."""
    spark_cols = sorted(spark_df.columns)
    spark_rows = spark_df.collect()

    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_cols = sorted(duck_cols_raw)

    assert spark_cols == duck_cols, f"columns differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count differs: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    s_multi = Counter(
        tuple(_norm(r[c]) for c in spark_cols) for r in spark_rows
    )
    idx = {c: i for i, c in enumerate(duck_cols_raw)}
    d_multi = Counter(
        tuple(_norm(r[idx[c]]) for c in duck_cols) for r in duck_rows
    )
    if s_multi != d_multi:
        only_s = list((s_multi - d_multi).items())[:5]
        only_d = list((d_multi - s_multi).items())[:5]
        raise AssertionError(
            f"value mismatch; sample spark-only={only_s} duckdb-only={only_d}"
        )
