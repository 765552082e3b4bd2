"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``data_ingestion_api_system_loop_ai_spark.registry`` (one entry per implemented
operator from SURVEY.md section 2; oracle SQL omitted only for
non-SQL-expressible ops, which get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_api_system_loop_ai_spark.registry import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_pipeline_e2e, SURVEY.md section 2.1 composite)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_pipeline_e2e"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return dict(ORACLES)
