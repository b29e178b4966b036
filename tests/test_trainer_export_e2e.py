"""End-to-end last mile: curate → encode → pack → shard → verify.

Integration of the trainer-export seam the B-series builds piecewise:
B42 token-ID encoding feeds B18 sequence packing feeds B37 shard export,
with the B37 manifest verifying the result and B42's decoder auditing a
sample. Every stage is deterministic, so the whole pipeline is too —
pinned by running it twice and hashing the final shards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.operators.encoding import (
    build_vocab,
    decode_ids,
    encode_documents,
)
from aws_snowflake_kinesis_airflow_pipeline_spark.operators.packing import (
    pack_sequences,
)
from aws_snowflake_kinesis_airflow_pipeline_spark.operators.sharding import (
    read_training_shard,
    verify_shards,
    write_training_shards,
)

N_DOCS = 120
MAX_TOKENS = 48
SHARDS = 3


@pytest.fixture(scope="module")
def corpus(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (
            i,
            " ".join(words[(i + j) % len(words)] for j in range((i * 7) % 30 + 1)),
        )
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_pipeline(spark, corpus, path):
    vocab = build_vocab(corpus, vocab_size=5)  # 6 words: one becomes OOV
    encoded = encode_documents(corpus, vocab)
    packed = pack_sequences(encoded, "doc_id", "n_tokens", MAX_TOKENS)
    rows = encoded.join(packed.select("doc_id", "pack_id", "pack_tokens"), "doc_id")
    write_training_shards(rows, path, "doc_id", SHARDS, seed=11)
    return vocab, rows


def test_encode_pack_shard_verify(spark, corpus, tmp_path):
    path = str(tmp_path / "export")
    vocab, rows = _run_pipeline(spark, corpus, path)

    # Manifest verifies, shards union back to the corpus.
    chk = verify_shards(spark, path, "doc_id").collect()
    assert len(chk) == SHARDS and all(r["ok"] for r in chk)
    back = [read_training_shard(spark, path, s) for s in range(SHARDS)]
    ids = sorted(i for df in back for i in (r["doc_id"] for r in df.collect()))
    assert ids == list(range(N_DOCS))

    # Every pack respects the budget over the ACTUAL encoded lengths.
    pack_totals = (
        rows.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert all(r["t"] <= MAX_TOKENS for r in pack_totals)

    # OOV engaged but bounded (exactly one of six words is out-of-vocab).
    oov = rows.agg(
        F.sum("n_oov").alias("o"), F.sum("n_tokens").alias("t")
    ).first()
    assert 0 < oov["o"] < oov["t"]

    # Decode audit on one shard: in-vocab tokens round-trip.
    sample = read_training_shard(spark, path, 0).limit(5)
    dec = {
        r["doc_id"]: r["text"]
        for r in decode_ids(sample, vocab).collect()
    }
    orig = {
        r["doc_id"]: r["text"]
        for r in corpus.join(sample.select("doc_id"), "doc_id").collect()
    }
    for i, text in dec.items():
        got = text.split()
        want = orig[i].split()
        assert len(got) == len(want)
        assert all(g == w or g == "<unk>" for g, w in zip(got, want))


def test_pipeline_deterministic(spark, corpus, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    _run_pipeline(spark, corpus, p1)
    _run_pipeline(spark, corpus, p2)
    for s in range(SHARDS):
        a = [tuple(r) for r in read_training_shard(spark, p1, s).collect()]
        b = [tuple(r) for r in read_training_shard(spark, p2, s).collect()]
        assert a == b and len(a) > 0
