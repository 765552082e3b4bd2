"""Structured Streaming layer: the same logic as the batch operators,
run incrementally.

The reference processes its queue live (``processQueue`` +
``setTimeout``, ``ingestService.js:94-154``); the Spark equivalent is a
micro-batch stream: file/Kafka source -> declarative transforms ->
stateful sinks, with triggers supplying the pacing the reference got
from timers. Design stance (SURVEY.md section 7): batch-first
deterministic core, streaming as a thin incremental layer that must
agree with the batch result — enforced by giving the streaming tumbling
query the *same DuckDB oracle* as its batch twin.

``run_stream_to_table`` drives any stream to completion synchronously
(availableNow trigger + memory sink): the local-test harness for what
would be a continuously-running query against Kafka at 100 TB. The
file source scales: listing is incremental, per-micro-batch work is the
same partitioned plan as batch, and state (for windowed aggs) lives in
the checkpointed state store keyed by (window, group) — shardable across
executors.

The live Tier-A ingest pipeline (priority + 5 s rate pacing as a
trigger-paced stateful drain over ``transformWithStateInPandas``) is the
round-2 item; its deterministic closed form is already covered by the
batch pipeline operators.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (stand-in for Kafka).
    The nanos timestamp arrives as raw int64 and is truncated to
    microsecond TIMESTAMP_NTZ exactly like the batch loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn(
        "ts",
        F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
    )


def run_stream_to_table(
    df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> str:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the sink table name."""
    name = name or f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def tumbling_agg(events: DataFrame) -> DataFrame:
    """Streaming twin of operators.timeseries.q_stream_tumbling."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native streaming sessionization (session_window) — the streaming
    twin of the lag+cumsum batch form in q_sessionize.

    Watermarks require TIMESTAMP (with local zone), so the NTZ event time
    is cast at this boundary; with the session pinned to UTC the instant
    is unchanged."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def watermarked_tumbling(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Tumbling agg with a watermark: in append mode, windows finalize
    once the watermark passes, and events older than the watermark are
    dropped — the live form of q_watermark_late's semantics."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def q_streaming_exec_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling aggregation executed by the *streaming engine* (file
    source -> availableNow -> memory sink), returned as a DataFrame.
    Shares the batch tumbling oracle: streaming must agree with batch."""
    name = run_stream_to_table(tumbling_agg(events_stream(spark, sf_dir)))
    return spark.table(name)


STREAMING_QUERIES = {"q_streaming_exec_tumbling": q_streaming_exec_tumbling}


def _tumbling_oracle() -> dict[str, str]:
    from ..operators.timeseries import TUMBLING_ORACLE

    return {"q_streaming_exec_tumbling": TUMBLING_ORACLE}


STREAMING_ORACLES = _tumbling_oracle()
