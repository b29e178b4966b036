"""Streaming near-dup document ingest: foreachBatch + the persisted
MinHash index.

Composes the two halves the engine already has into the production
pattern an LLM-data pipeline runs continuously:

- :mod:`..operators.incremental` answers "which of these new docs
  near-duplicate anything kept?" against a persisted index without
  touching the corpus (probe broadcast + partition-pruned set fetch);
- Structured Streaming's ``foreachBatch`` delivers bounded micro-batches
  with replay (at-least-once) semantics, exactly the increment shape the
  index expects.

Per micro-batch: dedup the batch internally and against the index, then
publish survivors to the corpus table and register them in the index.
Both writes are guarded by a NOT-IN id anti-join (the reference's insert
discipline, airflow/dags/snowflake_data_pipeline.py:128-146), which makes
a replayed batch a no-op regardless of where the previous attempt died:

- died before the corpus write        -> replay redoes everything
- died between corpus write and index -> replay's survivors are already
  in the corpus (id guard skips them) but not yet indexed (index guard
  admits them) — each sink converges independently
- died after both                     -> survivors self-match in the
  index at Jaccard 1.0 and are dropped by the probe itself
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import near_dup_dedup
from ..operators.incremental import (
    append_to_index,
    compact_minhash_index,
    incremental_dedup_insert,
    write_minhash_index,
)


class NearDupIngest:
    """Continuous near-dup-deduped document ingest.

    ``corpus_path`` — published parquet of kept documents (the training
    corpus). ``index_path`` — the MinHash bucket/set store. Both are
    created on the first batch if absent.
    """

    def __init__(
        self,
        spark: SparkSession,
        corpus_path: str,
        index_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.8,
        num_hashes: int = 64,
        bands: int = 16,
        k: int = 3,
        compact_every: int | None = None,
    ) -> None:
        self.spark = spark
        self.corpus_path = corpus_path
        self.index_path = index_path
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.compact_every = compact_every
        self.batches = 0
        self.admitted = 0

    def _existing_ids(self, path: str) -> DataFrame | None:
        from ..sources.storage import table_absent

        try:
            return self.spark.read.parquet(path).select(self.id_col)
        except Exception as exc:
            if table_absent(exc):
                return None
            raise

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # One row per id per batch: file-source replays can deliver a doc
        # twice inside one micro-batch; the index probe only guards
        # against docs already PERSISTED.
        batch_df = batch_df.dropDuplicates([self.id_col]).localCheckpoint(
            eager=False  # builds inside the first probe/dedup action (guide §2.6)
        )
        self.batches += 1

        # Probe the store by reading it, not by a local-FS isdir — the
        # index lives on an object store in production.
        bootstrapping = (
            self._existing_ids(f"{self.index_path}/buckets") is None
        )
        if bootstrapping:
            # No store yet: the first batch is its own corpus — the batch
            # operator applies the identical min-id cluster policy, and
            # its survivors seed the index below.
            survivors = near_dup_dedup(
                batch_df,
                self.id_col,
                self.text_col,
                self.threshold,
                num_hashes=self.num_hashes,
                bands=self.bands,
                k=self.k,
            ).localCheckpoint(eager=False)
        else:
            survivors = incremental_dedup_insert(
                self.spark,
                batch_df,
                self.id_col,
                self.text_col,
                self.index_path,
                self.num_hashes,
                self.bands,
                self.k,
                self.threshold,
            ).localCheckpoint(eager=False)  # read by both guarded sinks below

        # Guarded publish: NOT-IN on id makes each sink idempotent under
        # foreachBatch replay (see module docstring for the crash matrix).
        corpus_ids = self._existing_ids(self.corpus_path)
        to_corpus = (
            survivors
            if corpus_ids is None
            else survivors.join(corpus_ids, self.id_col, "left_anti")
        )
        to_corpus.write.mode("append").parquet(self.corpus_path)

        if bootstrapping:
            if survivors.isEmpty():
                # Nothing to seed with (e.g. an empty first micro-batch);
                # the next non-empty batch bootstraps instead. Writing an
                # empty partitioned store would leave a schema-less dir.
                return
            write_minhash_index(
                survivors,
                self.id_col,
                self.text_col,
                self.index_path,
                self.num_hashes,
                self.bands,
                self.k,
            )
            self.admitted += survivors.count()
            return

        # Replay guard keys on BUCKETS — the index's commit marker (sets
        # are written first, buckets second; see write_minhash_index's
        # crash contract). Guarding on sets would let a crash between the
        # two writes permanently hide those docs from the probe surface:
        # replay would skip them (their set rows exist) and their buckets
        # would never be written.
        indexed_ids = self._existing_ids(f"{self.index_path}/buckets")
        to_index = (
            survivors
            if indexed_ids is None
            else survivors.join(
                indexed_ids.distinct(), self.id_col, "left_anti"
            )
        )
        # Cheap short-circuit: replays usually have nothing to add, and
        # append_to_index would still run the full signature pass.
        # localCheckpoint: to_index feeds the isEmpty probe, the index
        # append AND the admitted count — three evaluations of the
        # sets-scan + anti-join otherwise.
        to_index = to_index.localCheckpoint(eager=False)
        if not to_index.isEmpty():
            # Orphan set rows (crash after the sets append, before the
            # buckets append) must not double on replay.
            set_ids = self._existing_ids(f"{self.index_path}/sets")
            append_to_index(
                to_index,
                self.id_col,
                self.text_col,
                self.index_path,
                self.num_hashes,
                self.bands,
                self.k,
                exclude_set_ids=(
                    set_ids.distinct() if set_ids is not None else None
                ),
            )
            self.admitted += to_index.count()

        # Periodic small-files maintenance: every append above adds one
        # parquet wave per store directory; compaction rewrites each as a
        # single wave with probe results unchanged. Safe inside
        # foreachBatch — micro-batches are serialized, so the offline-
        # window contract holds; a crash mid-compaction self-heals on the
        # next batch (see operators/incremental.py's crash matrix).
        if self.compact_every and self.batches % self.compact_every == 0:
            compact_minhash_index(self.spark, self.index_path)

    def start(
        self,
        source: DataFrame,
        checkpoint: str,
        available_now: bool = True,
    ):
        """Attach to a streaming ``source`` of documents and run."""
        writer = (
            source.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
