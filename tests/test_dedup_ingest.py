"""Streaming near-dup ingest: foreachBatch micro-batches against the
persisted MinHash index (streaming/dedup_ingest.py).

Contracts: the streamed corpus equals the one produced by calling the
incremental batch API sequentially with the same waves (stream ≡ batch),
the published corpus is pairwise near-dup-free, and replaying the whole
input (new checkpoint, same data) admits nothing new.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import load_table
from aws_snowflake_kinesis_airflow_pipeline_spark.operators import incremental
from aws_snowflake_kinesis_airflow_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    near_dup_dedup,
)
from aws_snowflake_kinesis_airflow_pipeline_spark.streaming.dedup_ingest import (
    NearDupIngest,
)

SF_DIR = "/root/testdata/sf0.001"


def _waves(spark, n=3):
    """documents split into n arrival waves by id modulus (interleaves the
    fixture's planted near-dup groups across waves, so cross-wave drops
    and within-wave clusters both occur)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return docs, [
        docs.filter(F.col("doc_id") % n == i).localCheckpoint()
        for i in range(n)
    ]


def _run_stream(spark, tmp_path, tag, waves_dir):
    corpus = str(tmp_path / f"corpus_{tag}")
    index = str(tmp_path / f"index_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    ingest = NearDupIngest(spark, corpus, index)
    source = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(waves_dir)
    )
    q = ingest.start(source, ckpt)
    q.awaitTermination()
    return ingest, corpus, index


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ndi")
    docs, waves = _waves(spark)
    waves_dir = str(tmp_path / "waves")
    os.makedirs(waves_dir)
    for i, w in enumerate(waves):
        # One file per wave, renamed + mtime-staggered so the file source
        # (which orders by timestamp, tie-breaking on random part names)
        # delivers micro-batches in wave order — the order the sequential
        # reference below uses.
        staging = str(tmp_path / f"stage_{i}")
        w.coalesce(1).write.parquet(staging)
        part = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        dest = os.path.join(waves_dir, f"wave-{i}.parquet")
        os.rename(os.path.join(staging, part), dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    ingest, corpus, index = _run_stream(spark, tmp_path, "main", waves_dir)
    return docs, waves, ingest, corpus, index, tmp_path, waves_dir


def test_stream_equals_sequential_batch_api(spark, streamed):
    """Driving the waves through foreachBatch must keep exactly the ids
    the incremental batch API keeps when called wave by wave."""
    docs, waves, ingest, corpus, index, tmp_path, _ = streamed
    assert ingest.batches >= 3  # genuinely micro-batched

    ref_index = str(tmp_path / "ref_index")
    want: set[int] = set()
    first = near_dup_dedup(waves[0], "doc_id", "text")
    incremental.write_minhash_index(first, "doc_id", "text", ref_index)
    want |= {r["doc_id"] for r in first.select("doc_id").collect()}
    for wave in waves[1:]:
        s = incremental.incremental_dedup_insert(
            spark, wave, "doc_id", "text", ref_index
        ).localCheckpoint()
        incremental.append_to_index(s, "doc_id", "text", ref_index)
        want |= {r["doc_id"] for r in s.select("doc_id").collect()}

    got = {
        r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()
    }
    assert got == want
    assert ingest.admitted == len(want)
    # the dedup was non-vacuous: something was dropped across the stream
    assert len(want) < docs.count()


def test_streamed_corpus_is_near_dup_free(spark, streamed):
    """No two published docs near-duplicate each other — the invariant the
    corpus table promises its training-data consumers."""
    _, _, _, corpus, _, _, _ = streamed
    published = spark.read.parquet(corpus)
    assert minhash_lsh_pairs(published, "doc_id", "text").isEmpty()
    # and ids are unique (no double-append through replays/guards)
    n = published.count()
    assert published.select("doc_id").distinct().count() == n


def test_full_replay_admits_nothing(spark, streamed):
    """Re-streaming the identical input against the EXISTING index/corpus
    (fresh checkpoint, so every wave is redelivered) publishes nothing:
    survivors self-match in the index at Jaccard 1.0, dropped docs still
    match whatever dropped them or are guarded by the NOT-IN id check."""
    _, _, _, corpus, index, tmp_path, waves_dir = streamed
    before = spark.read.parquet(corpus).count()

    replay = NearDupIngest(spark, corpus, index)
    source = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(waves_dir)
    )
    q = replay.start(source, str(tmp_path / "ckpt_replay"))
    q.awaitTermination()

    assert replay.admitted == 0
    assert spark.read.parquet(corpus).count() == before


def test_in_stream_compaction_is_transparent(spark, streamed):
    """The same waves driven with compact_every=1 (compaction after every
    micro-batch — the most aggressive setting) must publish the identical
    corpus: compaction between batches may not change what later probes
    find. The compacted run's store also holds strictly fewer data files
    than the uncompacted one."""
    from aws_snowflake_kinesis_airflow_pipeline_spark.operators.incremental import (
        count_parquet_files,
    )

    _, _, _, corpus, index, tmp_path, waves_dir = streamed
    cpath = str(tmp_path / "corpus_compact")
    ipath = str(tmp_path / "index_compact")
    ingest = NearDupIngest(spark, cpath, ipath, compact_every=1)
    source = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(waves_dir)
    )
    ingest.start(source, str(tmp_path / "ckpt_compact")).awaitTermination()

    kept = {r["doc_id"] for r in spark.read.parquet(cpath).collect()}
    want = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == want
    assert count_parquet_files(spark, f"{ipath}/sets") < count_parquet_files(
        spark, f"{index}/sets"
    )


def test_torn_index_append_heals_on_replay(spark, tmp_path):
    """Crash contract of the two-directory index write: sets first,
    buckets second (buckets = commit marker). Simulate the torn state —
    a batch's SET rows appended but its buckets lost — then replay the
    batch through process_batch: the docs must be re-indexed (buckets
    appear), their set rows must NOT double, and a subsequent batch
    containing their near-duplicates must be rejected."""
    import shutil

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    w1 = docs.filter(F.col("doc_id") % 3 == 0).localCheckpoint()
    w2 = docs.filter(F.col("doc_id") % 3 == 1).localCheckpoint()

    ing = NearDupIngest(
        spark,
        index_path=str(tmp_path / "idx"),
        corpus_path=str(tmp_path / "corpus"),
    )
    ing.process_batch(w1, 0)  # bootstrap
    buckets_before = spark.read.parquet(f"{tmp_path}/idx/buckets")

    # Simulate the REACHABLE torn state: the batch publishes to the
    # corpus first, then appends sets, then crashes before the buckets
    # append — so run batch 2 fully and roll back ONLY buckets. The
    # corpus keeps batch-2's survivors (their publish committed) and
    # sets keeps their rows; replay must skip the corpus publish via the
    # id guard while still re-indexing the probe surface.
    bk = buckets_before.localCheckpoint()
    corpus_mid = spark.read.parquet(f"{tmp_path}/corpus").count()
    ing.process_batch(w2, 1)
    corpus_after_batch = spark.read.parquet(f"{tmp_path}/corpus").count()
    assert corpus_after_batch > corpus_mid  # batch 2 admitted something
    shutil.rmtree(f"{tmp_path}/idx/buckets")
    bk.write.parquet(f"{tmp_path}/idx/buckets")

    # Replay batch 2 against the torn index.
    ing.process_batch(w2, 1)
    # Corpus publish was idempotent: the already-published survivors were
    # skipped by the NOT-IN guard, nothing doubled.
    assert (
        spark.read.parquet(f"{tmp_path}/corpus").count()
        == corpus_after_batch
    )

    sets = spark.read.parquet(f"{tmp_path}/idx/sets")
    assert (
        sets.groupBy("doc_id").count().filter(F.col("count") > 1).count()
        == 0
    ), "set rows doubled on replay"
    buckets = spark.read.parquet(f"{tmp_path}/idx/buckets")
    w2_surviving = spark.read.parquet(f"{tmp_path}/corpus").join(
        w2.select("doc_id"), "doc_id", "left_semi"
    )
    missing = w2_surviving.join(
        buckets.select("doc_id").distinct(), "doc_id", "left_anti"
    ).count()
    assert missing == 0, "replayed docs absent from the probe surface"

    # The healed index must still reject near-duplicates of w2's docs:
    # replay w2 once more under a new batch id — nothing new admitted.
    before = spark.read.parquet(f"{tmp_path}/corpus").count()
    ing.process_batch(w2, 2)
    after = spark.read.parquet(f"{tmp_path}/corpus").count()
    assert after == before
