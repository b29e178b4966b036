"""Storage-layout tests: partition pruning actually prunes (checked in the
physical plan), bucketed joins actually skip the shuffle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import load_table
from aws_snowflake_kinesis_airflow_pipeline_spark.sources import storage


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_part")
    storage.write_events_partitioned(events, path)
    # hive layout on disk
    assert any(d.startswith("event_date=") for d in os.listdir(path))

    back = storage.read_events_partitioned(spark, path)
    assert back.count() == events.count()

    one_day = back.filter(F.col("event_date") == "2024-01-02")
    plan = _explain(one_day)
    # the date filter must reach partition pruning, not a post-scan filter
    assert "PartitionFilters" in plan
    assert "2024-01-02" in plan.split("PartitionFilters", 1)[1][:400]
    expected = events.filter(F.to_date("ts") == "2024-01-02").count()
    assert one_day.count() == expected


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    db = "t_buckets"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{db}.db", ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db}")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    storage.write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "okey"),
        f"{db}.orders_b", "okey", 8,
    )
    storage.write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "okey"),
        f"{db}.lineitem_b", "okey", 8,
    )
    # at fixture scale the dim side fits the broadcast threshold, which
    # bypasses bucketing entirely; disable broadcast to exercise the path
    # that matters at 100 TB (both sides too big to broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{db}.lineitem_b").join(
            spark.table(f"{db}.orders_b"), "okey"
        )
        plan = _explain(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-bucketed scan: no Exchange feeding the join
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        n = joined.count()
        assert (
            n
            == lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey
            ).count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP DATABASE {db} CASCADE")


def _merge_roundtrip(spark, path):
    """Shared body for the MERGE upsert: two overlapping batches plus a
    replay must land each key exactly once."""
    b1 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 6)], "event_id long, payload string"
    )
    b2 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4, 9)], "event_id long, payload string"
    )
    storage.merge_insert_new(spark, path, b1, "event_id")
    storage.merge_insert_new(spark, path, b2, "event_id")
    storage.merge_insert_new(spark, path, b2, "event_id")  # at-least-once replay
    return path


def test_merge_insert_new_parquet_fallback(spark, tmp_path):
    path = _merge_roundtrip(spark, str(tmp_path / "events_merge"))
    got = sorted(
        r["event_id"] for r in spark.read.parquet(path).collect()
    )
    assert got == list(range(1, 9))  # union of both batches, no duplicates


import pytest  # noqa: E402


def test_merge_insert_new_delta(spark, tmp_path):
    if not storage.delta_available(spark):
        pytest.skip(
            "delta-spark not installed in this container — the MERGE "
            "branch needs the Delta jar + session extension; the parquet "
            "fallback test above covers the operator contract here"
        )
    path = _merge_roundtrip(spark, str(tmp_path / "events_delta"))
    got = sorted(
        r["event_id"]
        for r in spark.read.format("delta").load(path).collect()
    )
    assert got == list(range(1, 9))


def test_merge_branch_builds_the_correct_merge(spark, tmp_path, monkeypatch):
    """No Delta jar ships in this container, so the MERGE branch can't run
    for real (the skip above). Validate its construction instead against a
    recording fake of the delta.tables API: the branch must target the
    right path, merge on t.<key> = s.<key>, insert ONLY when not matched
    (insert-if-absent, never update), and execute exactly once — with no
    parquet fallback write happening underneath."""
    import sys
    import types

    log: list[tuple] = []

    class FakeBuilder:
        def __init__(self, path):
            self.path = path

        def alias(self, a):
            log.append(("alias", self.path, a))
            return self

        def merge(self, source, cond):
            log.append(("merge", cond))
            return self

        def whenNotMatchedInsertAll(self):
            log.append(("whenNotMatchedInsertAll",))
            return self

        def whenMatchedUpdateAll(self):  # must never be called
            log.append(("whenMatchedUpdateAll",))
            return self

        def execute(self):
            log.append(("execute",))

    class FakeDeltaTable:
        @staticmethod
        def isDeltaTable(_spark, path):
            log.append(("isDeltaTable", path))
            return True

        @staticmethod
        def forPath(_spark, path):
            log.append(("forPath", path))
            return FakeBuilder(path)

    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = FakeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)
    monkeypatch.setattr(storage, "delta_available", lambda _s: True)

    path = str(tmp_path / "delta_target")
    staging = spark.createDataFrame(
        [(1, "v1")], "event_id long, payload string"
    )
    storage.merge_insert_new(spark, path, staging, "event_id")

    assert log == [
        ("isDeltaTable", path),
        ("forPath", path),
        ("alias", path, "t"),
        ("merge", "t.event_id = s.event_id"),
        ("whenNotMatchedInsertAll",),
        ("execute",),
    ]
    assert not os.path.exists(path)  # no parquet write snuck past the branch


def test_merge_insert_new_self_heals_empty_target_dir(spark, tmp_path):
    """A crashed first write can leave an empty target directory; the
    upsert must treat it as an absent target, not wedge permanently."""
    path = tmp_path / "events_empty"
    path.mkdir()
    b1 = spark.createDataFrame(
        [(1, "v1")], "event_id long, payload string"
    )
    storage.merge_insert_new(spark, str(path), b1, "event_id")
    got = [r["event_id"] for r in spark.read.parquet(str(path)).collect()]
    assert got == [1]
