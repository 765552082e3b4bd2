"""Central registry: query name -> (Spark callable, DuckDB oracle SQL).

``__spark_entry__.py`` re-exports these; each operator module contributes
its own ``*_QUERIES`` / ``*_ORACLES`` dicts. Queries without an oracle
entry get the driver's weaker rows-only check (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators.pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(queries: dict[str, QueryFn], oracles: dict[str, str]) -> None:
    for name, fn in queries.items():
        assert name not in QUERIES, f"duplicate query name {name}"
        QUERIES[name] = fn
    for name, sql in oracles.items():
        assert name in queries, f"oracle for unregistered query {name}"
        ORACLES[name] = sql


_register(PIPELINE_QUERIES, PIPELINE_ORACLES)


def _optional_modules() -> None:
    """Extend the registry from operator modules as they land; each
    module is independent so a broken import never hides the rest."""
    try:
        from .operators.relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES

        _register(RELATIONAL_QUERIES, RELATIONAL_ORACLES)
    except ImportError:
        pass
    try:
        from .operators.relational_ext import (
            RELATIONAL_EXT_ORACLES,
            RELATIONAL_EXT_QUERIES,
        )

        _register(RELATIONAL_EXT_QUERIES, RELATIONAL_EXT_ORACLES)
    except ImportError:
        pass
    try:
        from .operators.dedup import DEDUP_ORACLES, DEDUP_QUERIES

        _register(DEDUP_QUERIES, DEDUP_ORACLES)
    except ImportError:
        pass
    try:
        from .operators.similarity import SIMILARITY_ORACLES, SIMILARITY_QUERIES

        _register(SIMILARITY_QUERIES, SIMILARITY_ORACLES)
    except ImportError:
        pass
    try:
        from .operators.text_analysis import TEXT_ORACLES, TEXT_QUERIES

        _register(TEXT_QUERIES, TEXT_ORACLES)
    except ImportError:
        pass
    try:
        from .operators.timeseries import TIMESERIES_ORACLES, TIMESERIES_QUERIES

        _register(TIMESERIES_QUERIES, TIMESERIES_ORACLES)
    except ImportError:
        pass
    try:
        from .operators.udfs import UDF_ORACLES, UDF_QUERIES

        _register(UDF_QUERIES, UDF_ORACLES)
    except ImportError:
        pass
    try:
        from .operators.multimodal import MULTIMODAL_ORACLES, MULTIMODAL_QUERIES

        _register(MULTIMODAL_QUERIES, MULTIMODAL_ORACLES)
    except ImportError:
        pass
    try:
        from .streaming.live import STREAMING_ORACLES, STREAMING_QUERIES

        _register(STREAMING_QUERIES, STREAMING_ORACLES)
    except ImportError:
        pass


_optional_modules()
