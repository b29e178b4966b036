"""DDL surface tests: database/table/view lifecycle + CTAS refresh (A.3/K3/K4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.operators import ddl


def test_ddl_lifecycle(spark, tmp_path):
    db = "t_pipeline"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    # the in-memory catalog forgets tables across sessions but their managed
    # dirs survive — clear any leftover so CREATE TABLE doesn't collide
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{db}.db", ignore_errors=True)
    ddl.create_database(spark, db)
    ddl.create_tables(spark, db)
    assert spark.catalog.tableExists(f"{db}.raw_data")

    events = spark.createDataFrame(
        [
            ("e1", dt.datetime(2024, 1, 1, 10), "purchase", "user_1",
             '{"product_id": "p1", "price": 19.99}'),
            ("e2", dt.datetime(2024, 1, 1, 11), "view", "user_2",
             '{"product_id": "p2", "price": 29.99}'),
            ("e3", dt.datetime(2024, 1, 2, 9), "purchase", "user_1",
             '{"product_id": "p3", "price": 39.99}'),
        ],
        "event_id string, event_timestamp timestamp_ntz, event_type string, "
        "user_id string, data string",
    )
    ddl.append_with_ingest_time(events, f"{db}.raw_data")

    raw = spark.table(f"{db}.raw_data")
    assert raw.count() == 3
    assert raw.filter(F.col("inserted_at").isNull()).count() == 0

    ue = spark.table(f"{db}.user_events").orderBy("event_id").collect()
    assert [r["event_id"] for r in ue] == ["e1", "e3"]  # purchase filter
    assert ue[0]["product_id"] == "p1"
    assert abs(ue[0]["price"] - 19.99) < 1e-6  # VARIANT path + FLOAT cast

    ddl.refresh_daily_summary(spark, db)
    summary = {
        (r["event_date"].isoformat(), r["event_type"]): r["event_count"]
        for r in spark.table(f"{db}.daily_event_summary").collect()
    }
    assert summary[("2024-01-01", "purchase")] == 1
    assert summary[("2024-01-01", "view")] == 1
    assert summary[("2024-01-02", "purchase")] == 1

    # CTAS is a full refresh: appending and re-running replaces the table
    ddl.append_with_ingest_time(events.limit(1), f"{db}.raw_data")
    ddl.refresh_daily_summary(spark, db)
    summary2 = {
        (r["event_date"].isoformat(), r["event_type"]): r["event_count"]
        for r in spark.table(f"{db}.daily_event_summary").collect()
    }
    assert summary2[("2024-01-01", "purchase")] == 2
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
