"""Warehouse storage layout — the partition/bucket discipline that makes the
100 TB posture real (SURVEY.md §7 "partition discipline on every write").

- Event-shaped tables: hive-partitioned by event_date so hour/day-ranged
  queries prune at the directory level (the Firehose layout's analytical
  twin, parquet instead of gzip JSON).
- Fact tables for co-located joins: bucketed by join key so repeated
  key-equi-joins skip the shuffle entirely (bucket-aware scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(
    events: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist events partitioned by event_date (derived from ts). Daily
    partitions keep file counts sane at 100 TB (hour-level nesting only pays
    off past ~10 TB/day); within a partition parquet row-group stats give
    sub-day pruning for free."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition("event_date")  # one writer wave per partition, no tiny files
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_col`` between
    tables bucketed the same way need no shuffle (Catalyst recognizes the
    co-partitioning). The bucket count is the cluster-parallelism knob."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
