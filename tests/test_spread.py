"""spread(): the scan-parallelism guard must repartition exactly when the
incoming plan is under-parallelized — and prove it from metadata, without
instantiating RDDs or adding exchanges to already-shuffled plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import load_table
from aws_snowflake_kinesis_airflow_pipeline_spark.operators.spread import (
    _bytes_conf,
    spread,
)


def test_bytes_conf_parses_spark_size_strings():
    assert _bytes_conf("134217728") == 128 * 1024 * 1024
    assert _bytes_conf("128MB") == 128 * 1024 * 1024
    assert _bytes_conf("4m") == 4 * 1024 * 1024
    assert _bytes_conf("1g") == 1024**3
    assert _bytes_conf("512k") == 512 * 1024
    assert _bytes_conf("100") == 100
    assert _bytes_conf("7b") == 7


def test_spread_repartitions_single_row_group_scan(spark, sf_dir):
    """A small parquet scan arrives in fewer splits than cores; spread must
    add the repartition so per-row work runs on every core."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = spread(docs, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan, "under-parallelized scan was not repartitioned"
    target = spark.sparkContext.defaultParallelism
    # AQE may coalesce downstream, but the declared repartition must target
    # the session's core count.
    assert f"REPARTITION_BY_NUM" in plan


def test_spread_is_noop_on_exchange_bearing_plans(spark, sf_dir):
    """An input that already shuffled is already parallelized — spread must
    not add a second text-carrying exchange (and must not probe df.rdd,
    which would execute the shuffle at plan-construction time)."""
    docs = load_table(spark, sf_dir, "documents").repartition(4, "doc_id")
    out = spread(docs, "doc_id")
    assert out is docs


def test_spread_is_noop_when_scan_is_well_split(spark, sf_dir):
    """When file metadata says the scan already yields >= core-count
    splits, spread must leave the plan untouched. Simulated by shrinking
    maxPartitionBytes so the same file counts as many splits."""
    old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        out = spread(docs, "doc_id")
        assert out is docs
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_spread_in_memory_input_falls_back_to_rdd_probe(spark):
    """createDataFrame inputs have no files; the rdd-partition probe decides.
    A tiny local relation parallelizes below core count -> repartition."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = spread(df, "id")
    # Either already at >= defaultParallelism partitions (then unchanged)
    # or repartitioned; in both cases results are identical.
    assert {r["id"] for r in out.collect()} == {1, 2}


def test_no_inferred_generate_filter_below_exchange(spark, sf_dir):
    """Regression guard for the InferFiltersFromGenerate exclusion: with
    the rule active, every explode over a computed array gets a
    size(arr) > 0 filter with the FULL array expression inlined, and
    pushdown drags that duplicate below the scan exchange — the shingle
    index then computes every shingle set twice, once serialized on the
    scan's task count (measured 6.3 s -> 0.7 s at sf1 from excluding it).
    The session factory must keep the rule excluded."""
    from aws_snowflake_kinesis_airflow_pipeline_spark.operators.dedup import (
        doc_shingles,
    )

    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    exploded = doc_shingles(docs, "doc_id", "text", 3).select(
        "doc_id", F.explode("hs").alias("s")
    )
    plan = exploded._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter (size(" not in plan.replace("Filter ((size(", "Filter (size(")
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    assert "InferFiltersFromGenerate" in excluded
