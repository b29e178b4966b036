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


def delta_available(spark: SparkSession) -> bool:
    """True when the runtime can execute ACID MERGE: the delta-spark python
    package is importable AND the session was built with the Delta SQL
    extension + catalog. Feature detection, not configuration — the engine
    runs identically (via the parquet fallback) when the answer is False,
    as it is in this container (no delta jar baked in)."""
    import importlib.util

    if importlib.util.find_spec("delta") is None:
        return False
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in ext


def merge_insert_new(
    spark: SparkSession, target_path: str, staging: DataFrame, key: str
) -> None:
    """Insert-if-absent upsert (the reference's ``INSERT .. WHERE event_id
    NOT IN (SELECT event_id FROM EVENTS)``, K5/J1) against a path-managed
    table.

    Delta path (when :func:`delta_available`): ``MERGE .. WHEN NOT MATCHED
    THEN INSERT`` — ACID, so concurrent writers can't race the read-check
    against the append (reference airflow/dags/snowflake_data_pipeline.py:113-149
    gets this from Snowflake transactions; parquet directories have no
    equivalent). Parquet fallback: read target keys, left-anti join, append
    — correct under the single-writer discipline the streaming pipeline
    already enforces (one query, checkpointed).

    ``staging`` must be unique on ``key`` (callers dedup within the batch
    first); MERGE throws on multiple source matches by design.
    """
    if delta_available(spark):
        from delta.tables import DeltaTable

        if DeltaTable.isDeltaTable(spark, target_path):
            (
                DeltaTable.forPath(spark, target_path)
                .alias("t")
                .merge(staging.alias("s"), f"t.{key} = s.{key}")
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        existing = _read_target_keys(spark, target_path, key)
        if existing is None:
            # genuinely new target -> create it as Delta. errorifexists
            # guards the race where the path appeared between the checks.
            staging.write.format("delta").mode("errorifexists").save(
                target_path
            )
            return
        # Existing NON-Delta data at the target: never silently convert
        # (an overwrite here would destroy previously ingested rows) —
        # fall through to the parquet append path.
    else:
        existing = _read_target_keys(spark, target_path, key)

    new_rows = (
        staging
        if existing is None
        else staging.join(existing, key, "left_anti")
    )
    new_rows.write.mode("append").parquet(target_path)


def table_absent(exc: Exception) -> bool:
    """True only for 'this parquet table effectively does not exist':
    never created (PATH_NOT_FOUND) or a crashed first write left an
    empty/markers-only directory (UNABLE_TO_INFER_SCHEMA). Treating the
    latter as fatal would wedge ingestion permanently — a retry can never
    succeed against a directory that exists but holds no data files.
    Anything else (transient FS failure, torn file, permissions) must
    propagate. THE one definition: streaming/pipeline.py and
    streaming/dedup_ingest.py's read-or-absent probes both drifted from
    hand-rolled copies of this marker set before it was shared."""
    msg = str(exc)
    return "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg


def _read_target_keys(spark: SparkSession, path: str, key: str):
    """Key column of an existing parquet target; None when the target is
    effectively absent (see :func:`table_absent`)."""
    try:
        return spark.read.parquet(path).select(key)
    except Exception as exc:
        if table_absent(exc):
            return None
        raise


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
