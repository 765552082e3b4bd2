"""Streaming layer: the incremental engine must agree with the batch
operators on the same data, and native streaming features
(session_window, watermark) must run end-to-end."""

from collections import Counter

from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.operators.timeseries import q_stream_tumbling
from data_ingestion_api_system_loop_ai_spark.streaming.live import (
    events_stream,
    run_stream_to_table,
    session_window_agg,
    tumbling_agg,
    watermarked_tumbling,
)


def test_streaming_tumbling_agrees_with_batch(spark, sf_dir):
    name = run_stream_to_table(tumbling_agg(events_stream(spark, sf_dir)))
    streaming_rows = Counter(map(str, spark.table(name).collect()))
    batch_rows = Counter(map(str, q_stream_tumbling(spark, sf_dir).collect()))
    assert streaming_rows == batch_rows


def test_session_window_runs(spark, sf_dir):
    name = run_stream_to_table(
        session_window_agg(events_stream(spark, sf_dir)), output_mode="append"
    )
    out = spark.table(name)
    assert {"user_id", "session_start", "session_end", "n_events"} <= set(out.columns)
    # append mode emits only watermark-finalized sessions; availableNow over
    # a finite file source finalizes everything before the final watermark.
    assert out.count() > 0
    bad = out.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_watermarked_tumbling_runs(spark, sf_dir):
    name = run_stream_to_table(
        watermarked_tumbling(events_stream(spark, sf_dir)), output_mode="append"
    )
    assert spark.table(name).count() > 0
