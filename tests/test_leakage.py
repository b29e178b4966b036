"""Leakage-safe splitting (operators/leakage.py).

Pins: the no-straddle guarantee on planted near-dup groups and on a
randomized pair graph, singleton independence from cluster membership,
determinism, and that fractions still roughly hold.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.operators.leakage import (
    leakage_safe_split,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into "
    "the deep green forest tonight while bright stars shine above the hills"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # 30 near-dup pairs (exact copy + one-word variant) + 140 singletons.
    for i in range(30):
        text = BASE + f" marker{i}"
        rows.append((2 * i, text))
        rows.append((2 * i + 1, text.replace("tonight", "today")))
    for j in range(140):
        rows.append((1000 + j, f"unique document {j} " + " ".join(
            f"w{j}x{k}" for k in range(25))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dups_never_straddle(spark, docs):
    # threshold 0.7: the one-word variants sit at 3-gram Jaccard ~0.76.
    out = leakage_safe_split(docs, val_fraction=0.3, threshold=0.7).select(
        "doc_id", "split_key", "split"
    )
    got = {r["doc_id"]: (r["split_key"], r["split"]) for r in out.collect()}
    assert len(got) == docs.count()
    for i in range(30):
        a, b = got[2 * i], got[2 * i + 1]
        assert a == b, f"pair {i} straddles: {a} vs {b}"
    # Both splits are actually populated.
    assert {s for _, s in got.values()} == {"train", "val"}


def test_explicit_pair_graph(spark):
    # A 4-chain plus isolated nodes, via a caller-provided pair set.
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (7, 8)], "id1 long, id2 long"
    )
    out = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in leakage_safe_split(
            docs, pairs=pairs, val_fraction=0.5
        ).collect()
    }
    assert out[0] == out[1] == out[2] == out[3]
    assert out[7] == out[8]
    assert out[0][0] == 0 and out[7][0] == 7  # min-id canonical keys
    assert out[4][0] == 4  # singleton keys on itself


def test_deterministic(spark, docs):
    a = sorted(
        (r["doc_id"], r["split"]) for r in leakage_safe_split(docs).collect()
    )
    b = sorted(
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(docs.repartition(7)).collect()
    )
    assert a == b


def test_randomized_graph_no_straddle(spark):
    rng = random.Random(41)
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(120)], "doc_id long, text string"
    )
    edges = [
        (rng.randint(0, 119), rng.randint(0, 119)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, pairs=pairs, val_fraction=0.4).collect()
    }
    for a, b in edges:
        assert out[a] == out[b], (a, b)
