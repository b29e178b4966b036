"""Streaming window operators (SURVEY.md §2 B14-B16) + batch equivalents.

Each streaming operator has a batch twin computing identical results on a
bounded frame — the test harness asserts stream(availableNow) == batch, and
the batch twins double as oracle-checkable registry queries.

Watermarks bound state: a tumbling/sliding agg keeps only windows newer than
(max event time - watermark); dropDuplicatesWithinWatermark evicts seen-key
state past the horizon. That bounded-state discipline is what makes these
run indefinitely at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Watermarks require TIMESTAMP; the engine stores TIMESTAMP_NTZ. Cast
    for state tracking (value-preserving under the pinned UTC session) —
    outputs cast window bounds back to NTZ so stream == batch twins."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Per-(window, event_type) counts over tumbling windows; late rows
    beyond the watermark are dropped (B14)."""
    src = _with_watermark(events, ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(ts_col, window_size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Sliding-window counts (each row lands in size/slide windows)."""
    src = _with_watermark(events, ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(ts_col, window_size, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "n",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Session windows per key: a session extends while consecutive events
    arrive within ``gap`` (B15). Spark merges/expires session state using
    the watermark; the batch twin uses the same session_window function."""
    src = _with_watermark(events, ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            key,
            "n",
        )
    )


def keyed_sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Per-(sliding window, key) counts — the state layer of trending
    top-k (B38). Watermark-bounded like :func:`sliding_counts`; state is
    one counter per live (window, key)."""
    src = _with_watermark(events, ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(ts_col, window_size, slide).alias("w"), key_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            key_col,
            "n",
        )
    )


def rank_trending(
    counts: DataFrame, k: int, key_col: str = "event_type"
) -> DataFrame:
    """Top-k keys per window by (count desc, key asc) — the deterministic
    finisher of trending top-k (B38).

    Applied to BATCH frames only: an append-mode streaming aggregate
    cannot host a rank (the rank of a window's keys isn't final until the
    watermark closes the window). In a live pipeline this runs inside
    foreachBatch over closed windows — exactly what the stream==batch
    test composes. The per-window rank is a bounded window function: each
    partition is one (window_start, window_end) group with ≤ |keys| rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("window_start", "window_end").orderBy(
        F.col("n").desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def trending_topk(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    k: int = 3,
) -> DataFrame:
    """Batch twin of streaming trending top-k: the k most frequent keys in
    every sliding window (B38). The streaming form is
    ``keyed_sliding_counts(streaming=True)`` → :func:`rank_trending` over
    each closed window."""
    return rank_trending(
        keyed_sliding_counts(
            events,
            ts_col,
            key_col,
            window_size,
            slide,
            streaming=False,
        ),
        k,
        key_col,
    )


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming dedup (B16): drop rows whose keys were already
    seen, with state evicted past the watermark horizon — the streaming
    form of the reference's NOT-IN insert filter (J1) with bounded memory.

    ``ts_col`` is cast back to TIMESTAMP_NTZ on the way out (the
    watermark needs the TZ-aware type for state tracking, but every
    consumer — the NTZ events table, unions with the batch twin — runs
    on the engine-wide NTZ contract; see the module note on window
    bounds)."""
    deduped = _with_watermark(
        events, ts_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)
    return deduped.withColumn(
        ts_col, F.col(ts_col).cast("timestamp_ntz")
    )


def batch_dedup_keep_first(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin of :func:`dedup_within_watermark`: keep the earliest row
    per key (ROW_NUMBER over event time = 1) — what the streaming dedup
    converges to on a bounded frame where every duplicate arrives inside
    the watermark. One shuffle on the keys; per-key state is one row.

    Ties on (key, ts) pick an arbitrary row among the tied ones — callers
    needing oracle-grade determinism must ensure tied rows are identical
    (true for at-least-once replay duplicates, the case this models).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def batch_sessions_gaps_and_islands(
    events: DataFrame,
    ts_col: str = "ts",
    gap_minutes: int = 30,
    key: str = "user_id",
) -> DataFrame:
    """Batch session assignment by the classic gaps-and-islands window trick
    (lag -> new-session flag -> running sum as session id). Semantically the
    batch ground truth for :func:`session_counts`."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col)
    gap_expr = F.lit(gap_minutes * 60)
    # NTZ has no direct cast to long in Spark 4; route through TIMESTAMP
    # (value-preserving under the engine's pinned UTC session TZ).
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    with_flag = events.withColumn(
        "new_session",
        # strict '>': session_window's end (last event + gap) is INCLUSIVE —
        # an event at exactly prev+gap merges into the session (verified
        # empirically against session_window in the boundary test).
        F.when(epoch - F.lag(epoch).over(w) > gap_expr, 1)
        .otherwise(0)
        .cast("long"),
    )
    with_id = with_flag.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy(key, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_last_event"),
            F.count("*").alias("n"),
        )
    )
