"""The ingest pipeline: E2/E3 fused into one checkpointed streaming query.

Reference behavior re-expressed (SURVEY.md §3):

- hourly DAG schedule            -> micro-batch trigger (or availableNow)
- S3KeySensor partition poll     -> streaming file source discovery
- COPY INTO staging (ON_ERROR)   -> PERMISSIVE read, corrupt-record column
- INSERT..SELECT w/ NOT IN dedup -> not-null filter + left-anti join append
- DQ SQL + Python gate           -> counts + raise inside foreachBatch
- XCom records_processed         -> observe() metrics on the batch
- email notify                   -> log line (listener hook point)

Everything per-batch happens inside ``foreachBatch`` in statement order —
the same linear dependency chain as the DAG (O5), but transactionally
closer: a failed gate fails the batch, and the checkpoint replays it.

Storage: parquet directories managed by path (works everywhere). The
pipeline's own insert step stays the partitioned anti-join append below
(it owns event_date partitioning and the per-batch insert metrics);
``sources.storage.merge_insert_new`` provides the same insert-if-absent
contract for unpartitioned path-managed tables, upgrading to ACID Delta
MERGE when the runtime has the jar (feature-detected; not available in
this container).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import (
    REQUIRED_EVENT_COLS,
    daily_event_summary,
    insert_dedup_anti_join,
)
from ..sources.json_landing import read_landing_stream


@dataclass
class IngestStats:
    """Per-batch observability (the XCom metric, O4)."""

    batches: int = 0
    rows_seen: int = 0
    rows_inserted: int = 0
    corrupt_rows: int = 0
    history: list[dict] = field(default_factory=list)


class IngestPipeline:
    """Landing zone -> raw table -> deduped events table -> daily summary."""

    def __init__(
        self,
        spark: SparkSession,
        landing_path: str,
        warehouse_path: str,
        fail_on_dq: bool = True,
    ):
        self.spark = spark
        self.landing_path = landing_path
        self.raw_path = os.path.join(warehouse_path, "raw_data")
        self.events_path = os.path.join(warehouse_path, "events")
        self.summary_path = os.path.join(warehouse_path, "daily_event_summary")
        self.checkpoint = os.path.join(warehouse_path, "_checkpoints", "ingest")
        self.fail_on_dq = fail_on_dq
        self.stats = IngestStats()

    # -- table handles ----------------------------------------------------

    @staticmethod
    def _is_path_missing(exc: Exception) -> bool:
        """True only for 'table effectively absent' — delegates to the
        shared sources/storage.py marker set (this used to be a narrower
        hand-rolled copy that rejected UNABLE_TO_INFER_SCHEMA, so a torn
        first events write wedged ingestion on every replay). Anything
        else must propagate: swallowing it would hand the anti-join an
        empty dedup target and re-insert the whole batch as duplicates."""
        from ..sources.storage import table_absent

        return table_absent(exc)

    def _read_events_table(self) -> DataFrame | None:
        """The events table, or None before the first successful insert."""
        try:
            return self.spark.read.parquet(self.events_path)
        except Exception as exc:
            if self._is_path_missing(exc):
                return None
            raise

    def events_table(self) -> DataFrame:
        return self.spark.read.parquet(self.events_path)

    def summary_table(self) -> DataFrame:
        self._heal_summary_swap()
        return self.spark.read.parquet(self.summary_path)

    def _heal_summary_swap(self) -> None:
        """Finish a refresh interrupted mid-swap. The swap is two atomic
        renames (old -> aside, staging -> live) followed by deleting the
        aside, so every crash point leaves either the old or the staged
        directory INTACT under a well-known name — never a partially
        deleted live dir (the rmtree-then-rename form had exactly that
        torn window). Heal order: a complete staging copy wins (it is
        the newer summary); otherwise restore the aside; a leftover
        aside next to a live dir is post-promote garbage."""
        staging = self.summary_path + "._staging"
        aside = self.summary_path + "._old"
        if not os.path.exists(self.summary_path):
            # Promote staging only if its write COMMITTED (_SUCCESS):
            # on the first-ever refresh there is no live dir to rename
            # aside, so 'live missing + staging present' can also mean a
            # torn in-progress staging write — promoting that would serve
            # a partial (or unreadable) summary as truth.
            if os.path.isdir(staging) and os.path.exists(
                os.path.join(staging, "_SUCCESS")
            ):
                os.replace(staging, self.summary_path)
            elif os.path.isdir(aside):
                os.replace(aside, self.summary_path)
        if os.path.exists(self.summary_path) and os.path.isdir(aside):
            shutil.rmtree(aside, ignore_errors=True)

    # -- the per-batch body (the DAG's task chain, in order) --------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            n_seen = batch_df.count()

            # 1. append everything (incl. corrupt) to raw_data — the landing
            #    table mirrors COPY INTO's keep-all behavior (K3/S3), plus
            #    the reference staging schema's lineage columns file_name /
            #    load_timestamp (airflow/dags/snowflake_data_pipeline.py:76-90).
            #    file_name comes from the source's _metadata column selected
            #    in start() (input_file_name() is empty inside foreachBatch).
            #    Written into a batch_id-keyed subdirectory with overwrite so
            #    a replayed batch (foreachBatch is at-least-once) replaces
            #    its own rows instead of appending a second copy.
            (
                batch_df.withColumn(
                    "load_timestamp",
                    F.current_timestamp().cast("timestamp_ntz"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(self.raw_path, f"batch_id={batch_id}"))
            )

            # 2. clean + transform: drop corrupt rows, enforce not-null keys,
            #    normalize column names to the engine's events schema.
            n_corrupt = batch_df.filter(
                F.col("_corrupt_record").isNotNull()
            ).count()
            clean = (
                batch_df.filter(F.col("_corrupt_record").isNull())
                .drop("_corrupt_record", "file_name")
                .withColumnRenamed("event_timestamp", "ts")
            )
            for c in REQUIRED_EVENT_COLS:
                clean = clean.filter(F.col(c).isNotNull())
            # Within-batch dedup: the reference's NOT-IN only guards against
            # rows already in the target, so a replay landing in the same
            # batch would insert twice and trip its own DQ gate. One row per
            # event_id per batch closes that hole.
            clean = clean.dropDuplicates(["event_id"])

            # 3. anti-join dedup append into events (J1/K5): at-least-once
            #    landing becomes exactly-once table content even if a batch
            #    retries after step-1 succeeded (defense-in-depth, O8).
            #    Events land partitioned by event_date so date-ranged reads
            #    (incl. the incremental summary below) prune partitions.
            existing = self._read_events_table()
            target = (
                existing.select("event_id")
                if existing is not None
                else clean.select("event_id").limit(0)
            )
            to_insert = insert_dedup_anti_join(clean, target).cache()
            try:
                n_insert = to_insert.count()
                # affected dates come from the BATCH (clean), not from
                # to_insert: on an at-least-once replay the anti-join strips
                # already-inserted rows, and deriving dates from to_insert
                # would skip the summary refresh + DQ re-check for exactly
                # the dates the interrupted attempt wrote.
                affected_dates = [
                    r["d"]
                    for r in clean.select(
                        F.to_date("ts").alias("d")
                    ).distinct().collect()
                ]
                if n_insert:
                    (
                        to_insert.withColumn("event_date", F.to_date("ts"))
                        .write.mode("append")
                        .partitionBy("event_date")
                        .parquet(self.events_path)
                    )
            finally:
                to_insert.unpersist()

            # 4. DQ gate (O6): duplicate event_ids. Scoped to the dates this
            #    batch touched (partition-pruned) — the anti-join guarantees
            #    inserted ids are new table-wide and the within-batch dedup
            #    guarantees batch uniqueness, so any new duplicate must
            #    involve a row in an affected partition; scanning the whole
            #    accumulated table per batch would grow with table age.
            events = self._read_events_table()
            if events is not None and affected_dates:
                n_dup = (
                    # filter on the PARTITION column (event_date), not
                    # to_date(ts): Catalyst can't derive the partition from
                    # an expression over a data column, so the ts form would
                    # scan the whole table and the pruning claim were false
                    events.filter(F.col("event_date").isin(affected_dates))
                    .groupBy("event_id")
                    .agg(F.count("*").alias("n"))
                    .filter(F.col("n") > 1)
                    .count()
                )
                if self.fail_on_dq and n_dup > 0:
                    raise ValueError(
                        f"DQ gate: {n_dup} duplicate event_ids in events table"
                    )

            # 5. summary refresh (K4) — incremental and idempotent: only the
            #    dates touched by this batch are recomputed, from the events
            #    *table* (so a retried batch reproduces the same rows instead
            #    of double-counting), and the partition filter prunes the
            #    date-partitioned events dir. The reference recomputes the
            #    whole summary hourly; at 100 TB that full scan per batch is
            #    the first thing to break.
            if events is not None:
                self._refresh_summary(events, affected_dates)

            # 6. metrics (O4) + notification hook (O7).
            self.stats.batches += 1
            self.stats.rows_seen += n_seen
            self.stats.rows_inserted += n_insert
            self.stats.corrupt_rows += n_corrupt
            self.stats.history.append(
                {
                    "batch_id": batch_id,
                    "seen": n_seen,
                    "inserted": n_insert,
                    "corrupt": n_corrupt,
                }
            )
        finally:
            batch_df.unpersist()

    def _refresh_summary(self, events: DataFrame, affected_dates) -> None:
        if not affected_dates:
            return  # nothing inserted -> summary already correct
        new_part = daily_event_summary(
            events.filter(F.col("event_date").isin(affected_dates))
        )
        try:
            old = self.summary_table()
            kept = old.filter(~F.col("event_date").isin(affected_dates))
            out = kept.union(new_part.select(*old.columns))
        except Exception as exc:
            # Only "summary doesn't exist yet" may fall back to new_part —
            # any other failure would overwrite the summary with just this
            # batch's dates, silently deleting every untouched date's rows.
            if not self._is_path_missing(exc):
                raise
            out = new_part
        # Write-temp-and-swap instead of in-place overwrite: the plan reads
        # the old directory, so writing it in place would truncate its own
        # input; the previous fix collect()ed the table through the driver
        # — bounded (dates x event types) but growing with history.
        # Staging keeps every row executor-side at any scale. The swap is
        # two atomic renames (never an rmtree of the live dir, whose torn
        # middle state a crash could serve as truth); every crash point
        # leaves a complete copy under a known name for _heal_summary_swap.
        staging = self.summary_path + "._staging"
        aside = self.summary_path + "._old"
        out.write.mode("overwrite").parquet(staging)
        shutil.rmtree(aside, ignore_errors=True)  # stale garbage only
        if os.path.exists(self.summary_path):
            os.replace(self.summary_path, aside)
        try:
            os.replace(staging, self.summary_path)
        except FileNotFoundError:
            # A concurrent summary_table() reader can run the heal between
            # our two renames and promote staging itself; if live exists
            # now, the swap is complete — just not by us.
            if not os.path.exists(self.summary_path):
                raise
        shutil.rmtree(aside, ignore_errors=True)

    # -- query lifecycle --------------------------------------------------

    def start(self, available_now: bool = True, max_files_per_trigger=None):
        stream = (
            read_landing_stream(
                self.spark, self.landing_path, max_files_per_trigger
            )
            .withColumn("file_name", F.col("_metadata.file_path"))
            # O4: the XCom records_processed metric as observe() — surfaces
            # in StreamingQueryProgress.observedMetrics without an extra job.
            .observe("ingest", F.count(F.lit(1)).alias("rows"))
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="300 seconds")
        return writer.start()

    def run_once(self):
        """Process everything currently in the landing zone, then stop —
        the test/catch-up mode (Trigger.AvailableNow ↔ one DAG run).
        Returns the terminated query (progress/observed metrics readable)."""
        q = self.start(available_now=True)
        q.awaitTermination()
        return q
