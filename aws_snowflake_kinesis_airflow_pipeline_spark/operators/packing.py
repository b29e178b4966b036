"""Sequence packing — fill fixed token-budget training sequences with
documents, minimizing padding. Exact bin packing is NP-hard and inherently
sequential; the scalable formulation packs *within partitions*:

1. shuffle docs into P partitions by content hash (stable),
2. inside each partition, first-fit-decreasing in pandas (Arrow-batched),
3. pack ids are (partition, local) pairs — globally unique, no coordination.

Packing quality is within a few percent of global first-fit for realistic
doc-length distributions, and the work is embarrassingly parallel — the
only cross-partition traffic is the initial hash shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_id", T.StringType()),
        T.StructField("pack_tokens", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    max_tokens: int,
    num_partitions: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign every document to a pack such that each pack's token total
    is <= max_tokens (documents longer than the budget get a singleton
    pack). Returns (doc_id, n_tokens, pack_id, pack_tokens).

    Deterministic: partition assignment is a content hash of the id, and
    packing order inside a partition is sorted — same input, same packs,
    any cluster shape. ``hash_fn="md5"`` swaps the part hash for the
    engine-portable md5 bucket (sampling.hash_bucket) so a DuckDB oracle
    can replay the identical partitioning — xxhash64 exists only in
    Spark. Same trick as deterministic_shuffle's portable permutation.
    """

    def pack_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)  # empty partitions yield no batches at all
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True)
        if rows.empty:
            return
        # A Spark partition can hold several hash-parts (hash(part)%N
        # collisions); pack each part independently, in a TOTAL order
        # (n_tokens desc, doc_id) so results don't depend on Arrow batch
        # arrival order.
        for part, gr in rows.groupby("part", sort=True):
            gr = gr.sort_values(
                ["n_tokens", "doc_id"], ascending=[False, True], kind="stable"
            )
            bins: list[int] = []  # remaining capacity per bin
            assign: list[int] = []
            for n in gr["n_tokens"]:
                n = int(n)
                placed = None
                for i, cap in enumerate(bins):
                    if n <= cap:
                        placed = i
                        bins[i] = cap - n
                        break
                if placed is None:
                    bins.append(max(max_tokens - n, 0))
                    placed = len(bins) - 1
                assign.append(placed)
            gr = gr.assign(_bin=assign)
            totals = gr.groupby("_bin")["n_tokens"].transform("sum")
            yield pd.DataFrame(
                {
                    "doc_id": gr["doc_id"],
                    "n_tokens": gr["n_tokens"],
                    "pack_id": [f"p{int(part)}_{b}" for b in gr["_bin"]],
                    "pack_tokens": totals,
                }
            )

    # Fail fast on non-integral ids: _PACK_SCHEMA carries doc_id as long,
    # and a silent cast would either kill the job under ANSI mode (string
    # UUIDs) or null out every returned doc_id — an unmappable packing.
    id_kind = df.schema[id_col].dataType.typeName()
    if id_kind not in ("long", "integer", "short", "byte"):
        raise TypeError(
            f"pack_sequences: id_col {id_col!r} must be an integral type "
            f"(got {id_kind}); map string ids to a surrogate long first "
            "(e.g. xxhash64) and join back after packing"
        )
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if hash_fn == "md5":
        from .sampling import hash_bucket

        part = hash_bucket(F.col(id_col).cast("string"), n_part)
    elif hash_fn == "xxhash64":
        part = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_part))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    prepared = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_count_col).cast("long").alias("n_tokens"),
        part.alias("part"),
    ).repartition(n_part, "part")
    return prepared.mapInPandas(
        lambda it: pack_partition(it), schema=_PACK_SCHEMA
    )


def mix_corpus(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Downsample sources to match target mixing *weights* (relative
    proportions). The largest feasible corpus honoring the weights is kept:
    the binding source keeps 100%, others are deterministically sampled
    down via content hash. One tiny groupBy for counts + one filter pass.
    """
    from .sampling import hash_bucket

    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
        if r[source_col] in weights
    }
    # Weighted sources absent from the corpus contribute nothing and are
    # skipped (honoring their weight literally would force an empty mix);
    # config/data drift therefore degrades the mix instead of crashing it.
    present = {s: w for s, w in weights.items() if s in counts and w > 0}
    if not present:
        return df.limit(0)
    # scale: the source with the smallest count/weight ratio binds
    scale = min(counts[s] / w for s, w in present.items())
    fractions = {
        s: min((present[s] * scale) / counts[s], 1.0) for s in present
    }
    buckets = 100000
    b = hash_bucket(key_col, buckets)
    cond = None
    for s, frac in fractions.items():
        p = (F.col(source_col) == s) & (b < round(frac * buckets))
        cond = p if cond is None else (cond | p)
    return df.filter(cond)
