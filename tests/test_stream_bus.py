"""Message-bus surface: connector absence raises the actionable error (the
frame contract itself — keyed JSON — is tested in test_streaming's
generator-shape test)."""

from __future__ import annotations

import pytest

from aws_snowflake_kinesis_airflow_pipeline_spark.sources import stream_bus


def test_reader_raises_actionable_error_without_connector(spark):
    with pytest.raises(stream_bus.ConnectorUnavailable, match="spark-sql-kafka"):
        stream_bus.read_events_bus(spark, "localhost:9092", "events")


def test_writer_raises_actionable_error_without_connector(spark):
    from aws_snowflake_kinesis_airflow_pipeline_spark.sources.rate_events import event_batch

    with pytest.raises(stream_bus.ConnectorUnavailable, match="spark-sql-kafka"):
        stream_bus.write_events_bus(
            event_batch(spark, 5), "localhost:9092", "events", "/tmp/ck"
        )


def test_frame_decode_roundtrips_producer_output(spark):
    """The data plane without the transport: producer frames (keyed JSON,
    cast to the Kafka source's binary key/value) decoded back must equal
    the original events column-for-column — so on a real cluster the only
    untested piece is Kafka's own wire transfer."""
    from pyspark.sql import functions as F

    from aws_snowflake_kinesis_airflow_pipeline_spark.sources.rate_events import (
        event_batch,
        keyed_for_stream_sink,
    )

    events = event_batch(spark, 50)
    frames = keyed_for_stream_sink(events).select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    )
    decoded = stream_bus.decode_bus_frames(frames)
    cols = ["event_id", "event_timestamp", "event_type", "user_id", "data"]
    want = sorted(tuple(r) for r in events.select(*cols).collect())
    got = sorted(tuple(r) for r in decoded.select(*cols).collect())
    assert got == want
    # the partition key IS the user id (per-user ordering survives the bus)
    assert decoded.filter(
        F.col("partition_key") != F.col("user_id").cast("string")
    ).count() == 0
