"""Deterministic training-shard export — the pipeline's last mile.

Trainers consume a corpus as N shards: each shard a random-looking,
reproducible slice, internally ordered, with a manifest the training job
can verify before it starts (counts + content checksums). This module is
the write-path counterpart of ``operators/sampling.deterministic_shuffle``:

* Shard assignment is a pure function of (seed, key):
  ``shard = pmod(shuffle_hash(seed, key), n_shards)`` — every shard is an
  unbiased ~1/N sample, stable across reruns, cluster shapes and
  speculative retries (``orderBy(rand())``-style sharding is none of
  those). A new seed is a new epoch permutation.
* Within-shard training order is ``(shuffle_hash, key)`` — materialized as
  an ``_order`` column so the reader restores it with a cheap local sort
  (no global sort ever materializes; the writer's only exchange is the
  hash repartition by shard).
* The manifest carries per-shard ``n_rows`` and an ORDER-INDEPENDENT
  content checksum (XOR of per-row xxhash64 over the key), so a reader can
  verify a shard without sorting it and the manifest is reproducible no
  matter how tasks interleaved.

Scale shape: one exchange (repartition by shard id), one local sort per
partition (so parquet row groups come out in training order), one bounded
(N-row) manifest aggregation. Shards land as ``shard=K/`` directories —
multiple files per shard are fine (readers glob the directory); file size
within a shard is governed by ``spark.sql.files.maxRecordsPerFile`` like
any other write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sampling import shuffle_hash

SHARD_COL = "shard"
ORDER_COL = "_order"


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Add deterministic ``shard`` and ``_order`` columns.

    ``key_col`` must uniquely identify rows (same contract as
    deterministic_shuffle — ties would make within-shard order
    partition-dependent).
    """
    if n_shards < 1:
        raise ValueError("assign_shards: n_shards must be >= 1")
    h = shuffle_hash(F.col(key_col), seed, portable)
    return df.withColumn(ORDER_COL, h).withColumn(
        SHARD_COL, F.pmod(F.col(ORDER_COL), F.lit(n_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    portable: bool = False,
) -> None:
    """Write ``path/data/shard=K/*.parquet`` + ``path/manifest/``.

    Each shard directory's files are written in training order (local
    sort by ``(_order, key)`` before the write), so a single-shard reader
    that preserves file/row-group order already sees the right sequence;
    ``read_training_shard`` re-sorts anyway to be layout-independent.
    """
    sharded = assign_shards(df, key_col, n_shards, seed, portable)
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, ORDER_COL, key_col)
        .write.partitionBy(SHARD_COL)
        .mode("overwrite")
        .parquet(f"{path}/data")
    )
    manifest = (
        sharded.groupBy(SHARD_COL)
        .agg(
            F.count("*").alias("n_rows"),
            # Order-independent content checksum over the KEYS (xxhash64
            # regardless of `portable` — the checksum never leaves Spark;
            # XOR-folded: commutative AND overflow-free under ANSI mode).
            F.bit_xor(F.xxhash64(F.col(key_col).cast("string"))).alias("key_checksum"),
        )
        .withColumn("seed", F.lit(seed))
        .withColumn("n_shards", F.lit(n_shards))
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/manifest")


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/manifest")


def read_training_shard(
    spark: SparkSession, path: str, shard: int, key_col: str | None = None
) -> DataFrame:
    """One shard, in training order, shard/order plumbing dropped.

    The shard filter is partition pruning (``shard=K`` directory), the
    sort is shard-local — reading one shard never touches the other N-1.
    Pass the writer's ``key_col`` to reproduce its exact tie-break: on an
    xxhash64 collision the ``_order`` sort alone is ambiguous, and the
    fallback (first remaining column) only matches the written order by
    accident of column position.
    """
    df = spark.read.parquet(f"{path}/data").where(F.col(SHARD_COL) == shard)
    cols = [c for c in df.columns if c not in (SHARD_COL, ORDER_COL)]
    tie = [key_col] if key_col is not None else cols[:1]
    return df.orderBy(ORDER_COL, *tie).select(*cols)


def verify_shards(spark: SparkSession, path: str, key_col: str) -> DataFrame:
    """Recompute per-shard count/checksum from the data and join the
    manifest: returns one row per shard with an ``ok`` flag. The training
    job's pre-flight check."""
    data = spark.read.parquet(f"{path}/data")
    actual = data.groupBy(SHARD_COL).agg(
        F.count("*").alias("actual_rows"),
        F.bit_xor(F.xxhash64(F.col(key_col).cast("string"))).alias("actual_checksum"),
    )
    return (
        read_manifest(spark, path)
        .join(actual, SHARD_COL, "full")
        .select(
            SHARD_COL,
            "n_rows",
            "actual_rows",
            # coalesce: a shard present on only one side of the full join
            # (missing data dir, stale manifest row) compares to NULL, and
            # a pre-flight filtering ok == false would silently pass it.
            F.coalesce(
                (F.col("n_rows") == F.col("actual_rows"))
                & (F.col("key_checksum") == F.col("actual_checksum")),
                F.lit(False),
            ).alias("ok"),
        )
    )
