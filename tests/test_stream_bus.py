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
