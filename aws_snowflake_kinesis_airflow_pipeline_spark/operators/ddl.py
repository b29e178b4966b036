"""DDL / catalog surface (SURVEY.md §2 A.3) — the reference's
``sql/create_snowflake_tables.sql`` re-expressed against the Spark session
catalog.

Reference statements covered (file:line in the reference repo):
- D3 ``CREATE DATABASE/SCHEMA IF NOT EXISTS; USE``  (:1-5)
- D1 ``CREATE TABLE IF NOT EXISTS raw_data``  (:8-15) — typed columns;
  the ``inserted_at DEFAULT CURRENT_TIMESTAMP()`` column is injected at
  write time by :func:`append_with_ingest_time` (Spark DDL DEFAULT exists
  but write-time injection matches the engine's append path).
- D2 ``CREATE OR REPLACE VIEW user_events``  (:18-28)
- K4 ``CREATE OR REPLACE TABLE daily_event_summary AS SELECT``  (:31-39)
  as an overwrite CTAS.

Managed tables default to parquet; a warehouse dir pins location for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_DATA_DDL = """
CREATE TABLE IF NOT EXISTS {db}.raw_data (
  event_id        STRING,
  event_timestamp TIMESTAMP_NTZ,
  event_type      STRING,
  user_id         STRING,
  data            STRING,
  inserted_at     TIMESTAMP_NTZ
) USING parquet
"""

USER_EVENTS_VIEW_DDL = """
CREATE OR REPLACE VIEW {db}.user_events AS
SELECT event_id,
       user_id,
       event_timestamp,
       get_json_object(data, '$.product_id')             AS product_id,
       CAST(get_json_object(data, '$.price') AS FLOAT)   AS price
FROM {db}.raw_data
WHERE event_type = 'purchase'
"""


def create_database(spark: SparkSession, db: str = "pipeline") -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"USE {db}")


def create_tables(spark: SparkSession, db: str = "pipeline") -> None:
    spark.sql(RAW_DATA_DDL.format(db=db))
    spark.sql(USER_EVENTS_VIEW_DDL.format(db=db))


def append_with_ingest_time(df: DataFrame, table: str) -> None:
    """K3: append with the DEFAULT CURRENT_TIMESTAMP() lineage column."""
    # v1 session-catalog tables reject the DataFrameWriterV2 path; the
    # classic by-name append covers both catalogs.
    df.withColumn(
        "inserted_at", F.current_timestamp().cast("timestamp_ntz")
    ).write.mode("append").saveAsTable(table)


def refresh_daily_summary(spark: SparkSession, db: str = "pipeline") -> None:
    """K4 CTAS overwrite — full refresh each run like the reference's hourly
    ``CREATE OR REPLACE TABLE``. The v1 session catalog has no RTAS, so the
    equivalent ``mode("overwrite").saveAsTable`` form is used (SURVEY.md §2
    K4's stated mapping)."""
    summary = spark.sql(
        f"""
        SELECT CAST(event_timestamp AS DATE) AS event_date,
               event_type,
               COUNT(*)             AS event_count,
               MIN(event_timestamp) AS first_event,
               MAX(event_timestamp) AS last_event
        FROM {db}.raw_data
        GROUP BY 1, 2
        """
    )
    summary.write.mode("overwrite").saveAsTable(f"{db}.daily_event_summary")
