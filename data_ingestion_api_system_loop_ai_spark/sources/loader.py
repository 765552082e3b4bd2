"""Sources: parquet loaders for the test star schema + generic readers.

The reference's only source is HTTP JSON (``src/app.js:7``); here the
source layer is Spark's readers — columnar parquet with predicate
pushdown and column pruning by default. At 100 TB the same call reads a
partitioned parquet/lakehouse layout; nothing here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TPCH_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Plain ``spark.read.parquet`` so Catalyst
    keeps pushdown/pruning; do not cache here — callers decide.

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; it is read as raw nanos (legacy conf) and
    truncated to microsecond TIMESTAMP_NTZ — the same ns->us truncation
    DuckDB applies, so oracle comparisons agree exactly.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the driver's
    DuckDB view registration so SQL-form queries share table names)."""
    for name in TPCH_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_json_source(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON source with a fixed schema (no inference) — the batch
    analogue of the reference's ``express.json()`` ingest parsing."""
    return spark.read.schema(schema).json(path)


def read_csv_source(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def spread_small_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition a CPU-heavy relation to ``defaultParallelism`` ONLY
    when its scan arrives in fewer partitions — a small corpus lands as
    one input split, which serializes per-row compute (tokenize /
    shingle / digest featurizes) onto one core. Two traps this helper
    encodes: (a) at real scale inputs already carry >= cores splits, so
    the guard makes this a NO-OP there (never a corpus-wide shuffle for
    nothing); (b) the repartition must be explicitly NUMBERED — AQE
    coalesces shuffles BY BYTE SIZE, so a column-only repartition of a
    byte-tiny, CPU-heavy relation gets coalesced straight back to one
    task."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)
