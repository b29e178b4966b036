"""Property-based tests (SURVEY.md §5): dedup idempotence and summary
additivity — the invariants the reference's at-least-once + NOT-IN design
exists to guarantee (O8 + J1)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.operators.relational import (
    daily_event_summary,
    insert_dedup_anti_join,
)

BASE = dt.datetime(2024, 1, 1)

event_rows = st.lists(
    st.tuples(
        st.one_of(st.integers(0, 30), st.none()),  # event_id incl. NULLs
        st.integers(0, 72),  # hours offset -> spans 4 dates
        st.sampled_from(["view", "click", "purchase", "signup"]),
        st.integers(1, 5),
    ),
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def mk(spark, rows):
    return spark.createDataFrame(
        [
            (eid, BASE + dt.timedelta(hours=h), et, u)
            for (eid, h, et, u) in rows
        ],
        "event_id long, ts timestamp_ntz, event_type string, user_id long",
    )


@given(batch=event_rows, target=event_rows)
@SETTINGS
def test_dedup_insert_idempotent(spark, batch, target):
    """Inserting a batch twice yields the same target as inserting once:
    after the first insert every batch event_id exists in the target, so the
    second anti-join inserts nothing."""
    batch_df, target_df = mk(spark, batch), mk(spark, target)
    first = insert_dedup_anti_join(batch_df, target_df)
    target_after = target_df.select(*first.columns).union(first)
    second = insert_dedup_anti_join(batch_df, target_after)
    assert second.count() == 0


@given(a=event_rows, b=event_rows)
@SETTINGS
def test_summary_additivity(spark, a, b):
    """summary(a ∪ b) == merge(summary(a), summary(b)) — hourly summaries
    re-aggregate to the same result as one summary over the union, the
    invariant that makes incremental refresh correct."""
    da, db = mk(spark, a), mk(spark, b)
    direct = {
        (r["event_date"], r["event_type"]): (
            r["event_count"], r["first_event"], r["last_event"]
        )
        for r in daily_event_summary(da.union(db)).collect()
    }
    merged_df = (
        daily_event_summary(da)
        .union(daily_event_summary(db))
        .groupBy("event_date", "event_type")
        .agg(
            F.sum("event_count").alias("event_count"),
            F.min("first_event").alias("first_event"),
            F.max("last_event").alias("last_event"),
        )
    )
    merged = {
        (r["event_date"], r["event_type"]): (
            r["event_count"], r["first_event"], r["last_event"]
        )
        for r in merged_df.collect()
    }
    assert direct == merged


doc_rows = st.lists(
    st.tuples(
        st.integers(0, 1_000_000),  # doc_id (dups allowed across rows)
        st.text(
            alphabet="ab c", min_size=0, max_size=12
        ),  # tiny texts incl. duplicates/empties
    ),
    max_size=20,
)


@given(rows=doc_rows)
@SETTINGS
def test_exact_dedup_idempotent_and_replay_invariant(spark, rows):
    """exact_dedup is a fixpoint (dedup∘dedup == dedup) and replay-stable
    (dedup(x ∪ x) == dedup(x)) — the invariants that make it safe under
    at-least-once upstream delivery."""
    from aws_snowflake_kinesis_airflow_pipeline_spark.operators.dedup import (
        exact_dedup,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = exact_dedup(df, key_cols=["text"], id_col="doc_id")
    twice = exact_dedup(once, key_cols=["text"], id_col="doc_id")
    replay = exact_dedup(df.union(df), key_cols=["text"], id_col="doc_id")

    def rowset(d):
        return {tuple(r) for r in d.collect()}

    expect = rowset(once)
    assert rowset(twice) == expect
    assert rowset(replay) == expect
