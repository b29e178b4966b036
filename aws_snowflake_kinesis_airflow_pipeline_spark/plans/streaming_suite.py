"""Batch twins of the streaming window operators (B14-B15) as oracle-checked
registry queries. The streaming forms (watermarks, state eviction,
dropDuplicatesWithinWatermark) are exercised by tests/test_streaming.py via
stream==batch equivalence; these entries pin the window *semantics* against
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.event_funnel import funnel_conversion
from ..operators.retention import cohort_retention
from ..operators.robust import grouped_mad_outliers_paired
from ..operators.transitions import event_transitions
from ..streaming import joins as J
from ..streaming import windows as W
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "s1_window_counts",
    oracle="""
    WITH vmed AS (
      SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    vmad AS (
      SELECT e.event_type,
             QUANTILE_CONT(ABS(e.value - m.med), 0.5) AS mad
      FROM events e JOIN vmed m USING (event_type) GROUP BY 1
    ),
    f1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    f2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN f1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > f1.t1
        AND e.ts <= f1.t1 + INTERVAL '1 hour'
      GROUP BY 1
    ),
    f3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN f1 USING (user_id) JOIN f2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > f2.t2
        AND e.ts <= f1.t1 + INTERVAL '1 hour'
      GROUP BY 1
    )
    SELECT 'tumbling' AS op,
           DATE_TRUNC('hour', ts) AS window_start,
           DATE_TRUNC('hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'sliding' AS op,
           ws AS window_start,
           ws + INTERVAL '1 hour' AS window_end,
           CAST(NULL AS VARCHAR) AS event_type,
           COUNT(*) AS n
    FROM (
      SELECT UNNEST([
        time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
        time_bucket(INTERVAL '30 minutes', ts)
      ]) AS ws
      FROM events
    )
    GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'interval_join' AS op,
           DATE_TRUNC('hour', p.ts) AS window_start,
           DATE_TRUNC('hour', p.ts) + INTERVAL '1 hour' AS window_end,
           'purchase<-click' AS event_type,
           COUNT(*) AS n
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts > p.ts - INTERVAL '30 minutes'
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'trending' AS op, window_start, window_end, event_type, n FROM (
      SELECT ws AS window_start,
             ws + INTERVAL '1 hour' AS window_end,
             event_type,
             COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY ws ORDER BY COUNT(*) DESC, event_type
             ) AS rk
      FROM (
        SELECT UNNEST([
          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
          time_bucket(INTERVAL '30 minutes', ts)
        ]) AS ws, event_type
        FROM events
      )
      GROUP BY ws, event_type
    ) WHERE rk <= 2
    UNION ALL
    SELECT 'mad_outliers' AS op,
           CAST(NULL AS TIMESTAMP) AS window_start,
           CAST(NULL AS TIMESTAMP) AS window_end,
           e.event_type,
           COUNT(*) FILTER (WHERE ABS(e.value - m.med) > 3 * d.mad) AS n
    FROM events e JOIN vmed m USING (event_type)
                  JOIN vmad d USING (event_type)
    GROUP BY e.event_type
    UNION ALL
    SELECT 'mad_outliers_approx_ok' AS op,
           CAST(NULL AS TIMESTAMP) AS window_start,
           CAST(NULL AS TIMESTAMP) AS window_end,
           event_type,
           CAST(1 AS BIGINT) AS n
    FROM (SELECT DISTINCT event_type FROM events)
    UNION ALL
    SELECT 'funnel' AS op,
           CAST(NULL AS TIMESTAMP) AS window_start,
           CAST(NULL AS TIMESTAMP) AS window_end,
           s.step AS event_type,
           s.n
    FROM (
      SELECT 'view' AS step, (SELECT COUNT(*) FROM f1) AS n
      UNION ALL
      SELECT 'click', (SELECT COUNT(*) FROM f2)
      UNION ALL
      SELECT 'purchase', (SELECT COUNT(*) FROM f3)
    ) s
    UNION ALL
    SELECT 'retention' AS op,
           cohort AS window_start,
           CAST(NULL AS TIMESTAMP) AS window_end,
           CAST(period_offset AS VARCHAR) AS event_type,
           COUNT(DISTINCT user_id) AS n
    FROM (
      SELECT e.user_id, f.cohort,
             CAST(DATE_DIFF('day', f.cohort, DATE_TRUNC('week', e.ts)) // 7
                  AS INT) AS period_offset
      FROM events e
      JOIN (
        SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort
        FROM events GROUP BY 1
      ) f USING (user_id)
    )
    GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'transition' AS op,
           CAST(NULL AS TIMESTAMP) AS window_start,
           CAST(NULL AS TIMESTAMP) AS window_end,
           from_type || '->' || to_type AS event_type,
           COUNT(*) AS n
    FROM (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    )
    WHERE to_type IS NOT NULL
    GROUP BY 1, 2, 3, 4
    """,
    survey_ref="§2 B14 tumbling (per event_type) + sliding (1h/30m) window "
    "counts + §2 B31 stream-stream interval-join hourly rollup + §2 B38 "
    "trending top-k (top-2 event types per sliding window, deterministic "
    "(count desc, key asc) rank) + §2 B40 robust anomaly detection "
    "(per-event-type |value - median| > 3*MAD outlier counts, ~11% of "
    "rows on the heavy-tailed value column — non-vacuous; carried twice: "
    "exact hash-checked branch + the at-scale approx_percentile branch as "
    "an error band the oracle bounds to TRUE) + §2 B43 "
    "ordered funnel conversion (view→click→purchase within 1h, "
    "greedy-earliest, strictly-ordered, per-user min-time chain) + §2 B44 "
    "cohort retention (weekly first-seen cohorts × whole-period offsets, "
    "distinct returning users) + §2 B45 event-path transition counts "
    "(per-user lead over (ts, event_id) — the explicit tiebreak makes "
    "same-timestamp order data-determined), tagged so one oracle checks "
    "the batch twins of all eight operators",
)
def s1_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nine-branch events pack. The MAD operator rides twice: the exact
    branch (oracle pairing requires exact percentiles) and the
    ``approx=True`` GK-digest branch that IS the 100 TB plan
    (memory-bounded merge state — see operators/robust.py), checked as an
    error band: n=1 iff the approx outlier count lands within
    1%-of-group-size (+1) of the exact count, which the oracle asserts
    per event type — the same sketch-band pattern as b8_stats_pack."""
    ev = _events(spark, sf_dir)
    # Shared pinned base (round-13, guide §2.4/§5): the nine branches
    # reference the events scan 62 times in the un-pinned plan (funnel
    # steps, MAD passes, self-joins, and their broadcast copies each
    # re-plan the scan). At bench SFs, pin ONE five-column projection so
    # every branch reads the blocks instead of re-scanning parquet —
    # measured 34 scans -> 0 with the mad pin below already in place. At
    # real scale (exchange_partitions fires) pinning a corpus-sized table
    # is the round-9 OOM, so keep the raw scan: per-branch column pruning
    # at the parquet reader is the correct shape there.
    from ..operators.spread import exchange_partitions

    if exchange_partitions(ev) is None:
        ev = ev.select(
            "user_id", "ts", "event_type", "event_id", "value"
        ).localCheckpoint(eager=False)
    tumbling = W.tumbling_counts(ev, streaming=False).select(
        F.lit("tumbling").alias("op"),
        "window_start",
        "window_end",
        "event_type",
        "n",
    )
    sliding = W.sliding_counts(ev, streaming=False).select(
        F.lit("sliding").alias("op"),
        "window_start",
        "window_end",
        F.lit(None).cast("string").alias("event_type"),
        "n",
    )
    joined = J.interval_join_hourly_counts(ev, streaming=False).select(
        F.lit("interval_join").alias("op"),
        "window_start",
        "window_end",
        F.lit("purchase<-click").alias("event_type"),
        "n",
    )
    trending = W.trending_topk(ev, k=2).select(
        F.lit("trending").alias("op"),
        "window_start",
        "window_end",
        "event_type",
        "n",
    )
    # Robust anomaly counts on the continuous value column (eps guard not
    # needed off a value grid: a count flip would need a point within fp
    # noise of the 3*MAD threshold, measure-zero for continuous doubles).
    # The paired operator computes the exact and GK-digest stats in the
    # SAME three grouped passes (plus the group size folded into the
    # counting pass) — both branches below project off one result. That
    # result is PINNED (round-13): it is a per-event-type handful of rows
    # consumed by TWO union branches, and without the pin each consumer
    # re-plans the whole three-pass chain (and its nested broadcast
    # copies) — measured 70 -> 42 Exchanges / 40 -> 16 BroadcastHashJoins
    # for the pack, exec 1.5 -> ~0.95 s at sf0.1, identical rows. Tiny at
    # any scale (group-key cardinality), so no scale guard is needed.
    mad_stats = grouped_mad_outliers_paired(
        ev, ["event_type"], "value", z=3.0
    ).localCheckpoint(eager=False)
    outliers = mad_stats.select(
        F.lit("mad_outliers").alias("op"),
        F.lit(None).cast("timestamp_ntz").alias("window_start"),
        F.lit(None).cast("timestamp_ntz").alias("window_end"),
        "event_type",
        F.col("n_outliers").alias("n"),
    )
    approx_ok = mad_stats.select(
        F.lit("mad_outliers_approx_ok").alias("op"),
        F.lit(None).cast("timestamp_ntz").alias("window_start"),
        F.lit(None).cast("timestamp_ntz").alias("window_end"),
        "event_type",
        (
            F.abs(F.col("n_outliers_approx") - F.col("n_outliers"))
            <= F.lit(0.01) * F.col("n_values") + F.lit(1)
        )
        .cast("long")
        .alias("n"),
    )
    funnel = funnel_conversion(
        ev, ["view", "click", "purchase"], within="1 hour"
    ).select(
        F.lit("funnel").alias("op"),
        F.lit(None).cast("timestamp_ntz").alias("window_start"),
        F.lit(None).cast("timestamp_ntz").alias("window_end"),
        F.col("step").alias("event_type"),
        F.col("n_users").alias("n"),
    )
    # B44/B45 batch twins: cohort matrix keyed by its cohort week in
    # window_start (offset stringified into the type slot), transition
    # counts keyed as 'from->to'. The rate/probability projections
    # (retention_rates / transition_matrix) are trivial broadcasts over
    # these counts, pinned by tests/test_retention.py / test_transitions.py.
    retention = cohort_retention(ev, period="week").select(
        F.lit("retention").alias("op"),
        F.col("cohort").alias("window_start"),
        F.lit(None).cast("timestamp_ntz").alias("window_end"),
        F.col("period_offset").cast("string").alias("event_type"),
        F.col("n_users").alias("n"),
    )
    transitions = event_transitions(ev).select(
        F.lit("transition").alias("op"),
        F.lit(None).cast("timestamp_ntz").alias("window_start"),
        F.lit(None).cast("timestamp_ntz").alias("window_end"),
        F.concat_ws("->", "from_type", "to_type").alias("event_type"),
        F.col("n"),
    )
    return (
        tumbling.unionByName(sliding)
        .unionByName(joined)
        .unionByName(trending)
        .unionByName(outliers)
        .unionByName(approx_ok)
        .unionByName(funnel)
        .unionByName(retention)
        .unionByName(transitions)
    )


# The gaps-and-islands batch formulation (W.batch_sessions_gaps_and_islands)
# stays as the ground-truth twin used by tests/test_streaming.py; the driver
# check for B15 rides s4, whose oracle IS the gaps-and-islands SQL.


@register(
    "s4_session_window_counts",
    oracle="""
    WITH flags AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - LAG(epoch(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    ids AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flags
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           COUNT(*) AS n
    FROM ids
    GROUP BY user_id, session_id
    """,
    survey_ref="§2 B15 session_window operator (oracle: gaps-and-islands "
    "with last+gap inclusive-end semantics)",
)
def s4_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.session_counts(_events(spark, sf_dir), streaming=False).orderBy(
        "user_id", "session_start"
    )


@register(
    "s5_dedup_within_watermark_twin",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) AS rn
      FROM (
        SELECT event_id, user_id, event_type, ts, value FROM events
        WHERE event_id IS NOT NULL
        UNION ALL
        SELECT event_id, user_id, event_type, ts, value FROM (
          SELECT event_id, user_id, event_type, ts, value FROM events
          WHERE event_id IS NOT NULL
          ORDER BY event_id LIMIT 500
        )
      )
    )
    WHERE rn = 1
    """,
    survey_ref="§2 B16 streaming dedup with state "
    "(dropDuplicatesWithinWatermark; batch twin over an at-least-once "
    "replay, ROW_NUMBER()=1 oracle — the stream==batch equivalence itself "
    "is pinned by tests/test_streaming.py)",
)
def s5_dedup_within_watermark_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's at-least-once ingest (a replayed slice duplicates 500
    rows) deduped by key — batch twin of dropDuplicatesWithinWatermark.
    Replay duplicates are exact row copies, so keep-first is deterministic
    and SQL-expressible."""
    ev = (
        _events(spark, sf_dir)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .filter(F.col("event_id").isNotNull())
    )
    replay = ev.orderBy("event_id").limit(500)
    return W.batch_dedup_keep_first(ev.unionByName(replay), ["event_id"], "ts")
