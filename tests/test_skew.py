"""Skew operators must be result-identical to their plain forms — checked
on a deliberately skewed dataset (one key owning ~90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.operators import skew


def skewed_df(spark):
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") % 50).alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.union(cold)


def test_salted_count_matches_plain(spark):
    df = skewed_df(spark)
    plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in skew.salted_count_by_key(df, "k").collect()}
    assert salted == plain
    assert salted["hot"] == 900


def test_salted_distinct_count_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in skew.salted_distinct_count_by_key(df, "k", "v").collect()
    }
    assert salted == plain
    assert salted["hot"] == 50


def test_salted_distinct_count_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("k1", None), ("k1", None), ("k1", 1), ("k2", None)],
        "k string, v int",
    )
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in skew.salted_distinct_count_by_key(df, "k", "v").collect()
    }
    assert salted == plain == {"k1": 1, "k2": 0}


def test_salted_join_matches_plain(spark):
    left = skewed_df(spark)
    right = spark.createDataFrame(
        [("hot", 1), ("c1", 2), ("c2", 3)], "k string, tag int"
    )
    plain = sorted(
        (r["k"], r["v"], r["tag"])
        for r in left.join(right, "k", "inner").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["tag"])
        for r in skew.salted_inner_join(left, right, "k").collect()
    )
    assert salted == plain
    assert len(plain) == 900 + 10 + 10  # hot + c1 + c2 rows
