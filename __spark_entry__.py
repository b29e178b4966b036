"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a named
(spark, sf_dir) -> DataFrame callable.
``oracle_sql()`` — matching DuckDB SQL for each SQL-expressible query.

All real logic lives in the ``aws_snowflake_kinesis_airflow_pipeline_spark``
package; this module is a thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_snowflake_kinesis_airflow_pipeline_spark.plans import (
    oracle_sql_map,
    queries_map,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's materialized ``daily_event_summary`` (its hourly CTAS,
    sql/create_snowflake_tables.sql:31-39) — scan, date extraction, multi-key
    group-by, count/min/max, aliasing, end to end.
    """
    from aws_snowflake_kinesis_airflow_pipeline_spark.plans.registry import QUERIES

    return QUERIES["ref_daily_event_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
