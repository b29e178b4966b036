"""Incremental near-duplicate dedup against a persisted MinHash index.

The batch operators in :mod:`.dedup` answer "dedup this corpus"; a
production training-data pipeline instead receives a bounded new batch
each cycle and must answer "which of these new documents near-duplicate
anything already kept?" WITHOUT re-signaturing the corpus. The reference
pipeline has this exact shape at exact-id granularity — its hourly
INSERT...SELECT NOT IN dedup appends only unseen event_ids
(airflow/dags/snowflake_data_pipeline.py:128-146); this module is that
contract lifted to near-duplicate granularity.

Persist the corpus's band buckets and shingle sets once
(:func:`write_minhash_index`), then each increment runs:

1. batch signatures + band buckets        — row-local, batch-sized
2. probe: persisted buckets ⋈ batch buckets on (band_id, band_hash)
   — the batch side broadcasts, so the corpus bucket store is SCANNED
   (narrow: 24 B/row) but never shuffled or re-hashed
3. batch-vs-batch banding self-join       — batch-sized
4. exact-Jaccard verification of all candidates — candidate-volume; old
   docs' shingle sets are fetched from the set store with directory-level
   partition pruning (sets are hive-partitioned by a hash bucket of id,
   and only the candidate ids' buckets are read)

Cost per increment: O(|batch| + |candidates|) shuffle + one narrow corpus
scan. Nothing corpus-sized is shuffled, re-tokenized, or re-MinHashed —
the property that makes daily ingest against a 100 TB corpus feasible.

Semantics of :func:`incremental_dedup_insert` (the greedy incremental
analogue of :func:`.dedup.near_dup_dedup`): a batch doc is dropped when it
near-duplicates any indexed corpus doc; the remaining batch docs are
clustered among themselves (connected components over batch-batch pairs)
and the minimum id of each cluster survives. This is the fixpoint-free
online policy — corpus docs are never revisited, so survivors are stable
across increments. Re-ingesting a batch after appending its survivors
drops every doc that near-duplicates a kept doc (the reference's
idempotent NOT-IN re-ingest, lifted to near-dup granularity); a doc whose
only links were transitive — through cluster members that themselves got
dropped — is legitimately re-admitted, the standard behavior of greedy
online dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _hyperplanes,
    _posting_pairs,
    band_buckets,
    connected_components,
    cosine_pairs_udf,
    doc_shingles,
    hyperplane_buckets_udf,
    minhash_signatures,
    ngram_jaccard_pairs,
)

#: Hive-partition fanout of the shingle-set store. Candidate fetches read
#: only the candidate ids' directories, so a higher fanout prunes harder
#: but makes more (smaller) files; 64 keeps directories >= ~1.5 GB/100 TB.
N_SET_BUCKETS = 64


def _set_bucket(id_col: str):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(N_SET_BUCKETS)).alias(
        "set_bucket"
    )


def write_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    mode: str = "overwrite",
    exclude_set_ids: DataFrame | None = None,
) -> None:
    """Persist the two per-document artifacts incremental dedup needs:

    - ``{path}/buckets`` — (id, band_id, band_hash): the LSH probe
      surface, ``bands`` narrow rows per doc, written sorted by
      (band_id, band_hash) within partitions so row-group min/max stats
      line up with probe keys.
    - ``{path}/sets`` — (id, hs): hashed shingle sets for exact-Jaccard
      verification, hive-partitioned by ``set_bucket = xxhash64(id) %
      {N_SET_BUCKETS}`` so a candidate fetch reads only the candidate
      ids' directories instead of every set in the corpus (the heavy
      column lives here — pruning this scan is what matters).

    One pass over ``df``: shingle sets are computed once and reused for
    both signatures and the set store. ``mode="append"`` is the
    increment path (see :func:`append_to_index`).

    APPEND WRITE ORDER IS THE CRASH CONTRACT: sets first, buckets second,
    so a document visible in ``buckets`` is guaranteed verifiable in
    ``sets`` — buckets is the commit marker. Recovery probes (and replay
    guards) must therefore key on ``buckets``: a crash between the two
    writes leaves orphan set rows, which re-appends skip via
    ``exclude_set_ids`` (the probe surface never saw the doc, so it is
    correctly re-processed; only its set row must not double).

    Fresh ``overwrite`` builds run the two writes CONCURRENTLY (guide
    §2.6): they are independent jobs sharing the pinned shingle pass, and
    overlapping them lets the buckets job's tasks back-fill the sets
    job's straggler tail (same-sitting A/B at sf0.1: 6.1–6.9 s serial →
    3.7–4.3 s overlapped). The ordering contract above protects only the
    append path — an overwrite crash leaves a store that needs a rebuild
    whichever order the writes ran in (old buckets can reference ids the
    new sets no longer carry), so no recovery guarantee is weakened.
    """
    per_doc = doc_shingles(df, id_col, text_col, k).localCheckpoint(
        eager=False  # materializes inside the sets write, reused by buckets
    )
    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, k, per_doc=per_doc
    )
    sets = per_doc.select(id_col, "hs", _set_bucket(id_col))
    if exclude_set_ids is not None:
        sets = sets.join(exclude_set_ids, id_col, "left_anti")

    def _write_sets() -> None:
        (
            sets.repartition("set_bucket")  # one writer wave per directory
            .write.mode(mode)
            .partitionBy("set_bucket")
            .parquet(f"{path}/sets")
        )

    def _write_buckets() -> None:
        (
            band_buckets(sig, id_col, num_hashes, bands)
            .sortWithinPartitions("band_id", "band_hash")
            .write.mode(mode)
            .parquet(f"{path}/buckets")
        )

    if mode == "overwrite":
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            for fut in [pool.submit(_write_sets), pool.submit(_write_buckets)]:
                fut.result()
    else:
        _write_sets()
        _write_buckets()


def append_to_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    exclude_set_ids: DataFrame | None = None,
) -> None:
    """Add a batch's documents (normally :func:`incremental_dedup_insert`
    survivors) to an existing index. Append-only: hive partition append
    creates no conflicts, and bucketing by id keeps fetch pruning exact.
    ``exclude_set_ids``: ids whose SET rows already exist (orphans from a
    crash between the sets and buckets writes) — their sets are skipped,
    their buckets still appended."""
    write_minhash_index(
        df,
        id_col,
        text_col,
        path,
        num_hashes,
        bands,
        k,
        mode="append",
        exclude_set_ids=exclude_set_ids,
    )


def _verify_cross_pairs(
    candidates: DataFrame,
    new_sets: DataFrame,
    old_sets: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard over (new_id, old_id) candidates, each side's shingle
    sets from its own source — the same row-local array_intersect
    verification as ngram_jaccard_pairs' candidate path, which cannot be
    reused directly because its two sides come from one DataFrame."""
    s1 = new_sets.select(F.col(id_col).alias("new_id"), F.col("hs").alias("hs1"))
    s2 = old_sets.select(F.col(id_col).alias("old_id"), F.col("hs").alias("hs2"))
    # SHUFFLE_HASH for the same reason as ngram_jaccard_pairs' verify
    # joins: every side is batch/candidate volume, and a statically
    # mis-estimated broadcast of a checkpointed input cannot be demoted
    # by AQE (measured driver OOM on the batch path's equivalent join).
    return (
        candidates.join(s1.hint("shuffle_hash"), "new_id")
        .join(s2.hint("shuffle_hash"), "old_id")
        .select(
            "new_id",
            "old_id",
            F.size(F.array_intersect("hs1", "hs2")).alias("n_inter"),
            F.size("hs1").alias("n1"),
            F.size("hs2").alias("n2"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n1") + F.col("n2") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "old_id", "jaccard")
    )


def _cross_candidates(
    spark: SparkSession,
    new_buckets: DataFrame,
    index_path: str,
    id_col: str,
    broadcast_batch: bool,
) -> DataFrame:
    """(new_id, old_id) distinct band collisions between the batch's
    bucket triple and the persisted store. The batch side broadcasts, so
    the plan is one BroadcastHashJoin directly over the store's parquet
    scan — the corpus is read, never exchanged (pinned in
    tests/test_incremental.py on this un-checkpointed plan)."""
    corpus_buckets = spark.read.parquet(f"{index_path}/buckets")
    probe_side = new_buckets.select(
        F.col(id_col).alias("new_id"), "band_id", "band_hash"
    )
    if broadcast_batch:
        probe_side = F.broadcast(probe_side)
    return (
        corpus_buckets.select(
            F.col(id_col).alias("old_id"), "band_id", "band_hash"
        )
        .join(probe_side, ["band_id", "band_hash"])
        .select("new_id", "old_id")
        .distinct()
    )


def incremental_near_dup_pairs(
    spark: SparkSession,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.8,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Near-dup pairs between a new batch and (persisted corpus ∪ itself).

    Returns (id1, id2, jaccard, vs) with id1 < id2; ``vs`` is ``corpus``
    for batch-vs-index matches and ``batch`` for batch-internal matches.
    Batch docs re-submitted with an id already in the index match
    themselves at Jaccard 1.0 (``vs='corpus'``) — the signal
    :func:`incremental_dedup_insert` uses for idempotent re-ingest.

    ``broadcast_batch``: broadcast the batch's bucket triple into the
    corpus-bucket probe join (the designed shape — corpus scanned, never
    shuffled). Disable only for a batch too large to broadcast, which
    degrades to a shuffle join on (band_id, band_hash).
    """
    # Batch-sized artifacts, each read by 2+ downstream joins. All pins
    # here are LAZY local checkpoints (round-12): blocks still build
    # exactly once, but inside the first action that needs them — the
    # bounded hit-bucket collect below — instead of as four standalone
    # driver-waited jobs, so the batch passes overlap as stages of one
    # job. (Guide §2.6; measured ~4 s of per-job latency at sf0.1.)
    new_per_doc = doc_shingles(new_df, id_col, text_col, k).localCheckpoint(
        eager=False
    )
    new_sig = minhash_signatures(
        new_df, id_col, text_col, num_hashes, k, per_doc=new_per_doc
    )
    new_buckets = band_buckets(
        new_sig, id_col, num_hashes, bands
    ).localCheckpoint(eager=False)

    # --- batch vs corpus: probe the persisted bucket store -------------
    cross_cand = _cross_candidates(
        spark, new_buckets, index_path, id_col, broadcast_batch
    ).localCheckpoint(eager=False)  # candidate-volume; read by bucket collect + verify

    # Fetch ONLY candidate corpus docs' sets: directory pruning via the
    # id-hash partition key (driver-bounded collect: <= N_SET_BUCKETS
    # ints), then an id semi-join inside the surviving directories.
    cand_old_ids = cross_cand.select(
        F.col("old_id").alias(id_col)
    ).distinct()
    hit_buckets = [
        r["set_bucket"]
        for r in cand_old_ids.select(_set_bucket(id_col)).distinct().collect()
    ]
    old_sets = (
        spark.read.parquet(f"{index_path}/sets")
        .filter(F.col("set_bucket").isin(hit_buckets or [-1]))
        .join(cand_old_ids, id_col, "left_semi")
    )
    cross_pairs = _verify_cross_pairs(
        cross_cand, new_per_doc, old_sets, id_col, threshold
    )

    # --- batch vs batch: grouped pair emission at batch size (same form
    # as minhash_lsh_pairs — one exchange, no candidate self-join) ------
    batch_postings = (
        new_buckets.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    batch_cand = _posting_pairs(batch_postings).distinct().localCheckpoint(
        eager=False
    )
    batch_pairs = ngram_jaccard_pairs(
        new_df,
        id_col,
        text_col,
        k=k,
        threshold=threshold,
        candidates=batch_cand,
        per_doc_sets=new_per_doc,
    )

    return (
        cross_pairs.select(
            F.least("new_id", "old_id").alias("id1"),
            F.greatest("new_id", "old_id").alias("id2"),
            "jaccard",
            F.lit("corpus").alias("vs"),
        )
        .unionByName(batch_pairs.withColumn("vs", F.lit("batch")))
    )


def incremental_dedup_insert(
    spark: SparkSession,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.8,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Surviving rows of a new batch under the greedy incremental policy:
    drop batch docs that near-duplicate any indexed doc (including exact
    id re-ingest), then keep one representative (minimum id) per
    batch-internal near-dup cluster. The caller appends survivors with
    :func:`append_to_index` after whatever downstream gate it runs — the
    reference's DQ-gate-then-publish ordering
    (airflow/dags/snowflake_data_pipeline.py:154-202)."""
    pairs = incremental_near_dup_pairs(
        spark,
        new_df,
        id_col,
        text_col,
        index_path,
        num_hashes,
        bands,
        k,
        threshold,
        broadcast_batch,
    )
    return _greedy_insert(new_df, pairs, id_col)


def _greedy_insert(
    new_df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Apply the greedy incremental policy to a tagged pair list (the
    module-docstring semantics, shared by the text and embedding paths):
    drop batch docs with any ``vs='corpus'`` pair, cluster the remaining
    ``vs='batch'`` pairs, keep each cluster's minimum id."""
    pairs = pairs.localCheckpoint(eager=False)  # read by both consumers

    new_ids = new_df.select(id_col)
    corpus_dupped = (
        pairs.filter(F.col("vs") == "corpus")
        .select(F.col("id1").alias(id_col))
        .union(pairs.filter(F.col("vs") == "corpus").select(F.col("id2").alias(id_col)))
        .join(new_ids, id_col, "left_semi")  # keep only the batch-side ids
        .distinct()
    )
    remaining = new_df.join(corpus_dupped, id_col, "left_anti")

    # Cluster batch-internal pairs among docs that survived the corpus
    # check (a pair whose partner was corpus-dropped must not drag the
    # survivor down with it).
    batch_pairs = (
        pairs.filter(F.col("vs") == "batch")
        .join(
            corpus_dupped.select(F.col(id_col).alias("id1")), "id1", "left_anti"
        )
        .join(
            corpus_dupped.select(F.col(id_col).alias("id2")), "id2", "left_anti"
        )
        .select("id1", "id2")
    )
    comps = connected_components(batch_pairs)
    keepers = comps.groupBy("component").agg(F.min("id").alias(id_col))
    drop = comps.join(
        keepers.select(F.col(id_col).alias("id")), "id", "left_anti"
    ).select(F.col("id").alias(id_col))
    return remaining.join(drop, id_col, "left_anti")


# --------------------------------------------------------------------------
# Embedding (cosine) incremental dedup — the same store/probe/verify shape
# over hyperplane-LSH buckets instead of MinHash bands.
# --------------------------------------------------------------------------


def _embedding_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_bits: int,
    n_tables: int,
    dim: int,
    seed: int,
) -> DataFrame:
    """(id, table_id, bucket) under the index's fixed hyperplanes — the
    one bucketing definition both the store writer and every probe use
    (parameters travel in the index's meta file, so yesterday's store and
    today's batch can never disagree on resolution or seed)."""
    bucket_fn = hyperplane_buckets_udf(
        [_hyperplanes(dim, n_bits, seed + t * 1000) for t in range(n_tables)]
    )
    return df.select(
        id_col,
        F.posexplode(bucket_fn(F.col(vec_col).cast("array<double>"))).alias(
            "table_id", "bucket"
        ),
    )


def write_embedding_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Persist an embedding corpus for incremental cosine near-dup checks:

    - ``{path}/buckets`` — (id, table_id, bucket): n_tables narrow rows
      per vector, the probe surface.
    - ``{path}/vectors`` — (id, vec): hive-partitioned by the same
      id-hash bucket as the text set store, so candidate verification
      reads only candidate directories (vectors are the heavy column).
    - ``{path}/meta`` — one JSON row pinning (n_bits, n_tables, dim,
      seed): probes MUST bucket with the index's own parameters, and a
      store can't answer for parameters it wasn't built with.

    ``n_bits`` is fixed at build time (the batch operator's auto-sizing
    is a per-call decision; a persistent store needs one resolution).
    Choose it for the CORPUS's target occupancy — rebuilding the store is
    the resize path, same as any LSH index.
    """
    spark = df.sparkSession

    def _write_buckets() -> None:
        (
            _embedding_buckets(df, id_col, vec_col, n_bits, n_tables, dim, seed)
            .sortWithinPartitions("table_id", "bucket")
            .write.mode(mode)
            .parquet(f"{path}/buckets")
        )

    def _write_vectors() -> None:
        (
            df.select(
                id_col,
                F.col(vec_col).cast("array<double>").alias("vec"),
                _set_bucket(id_col),
            )
            .repartition("set_bucket")
            .write.mode(mode)
            .partitionBy("set_bucket")
            .parquet(f"{path}/vectors")
        )

    if mode == "overwrite":
        # Fresh build: the two store writes are independent jobs over the
        # same input plan — overlap them so the second job's tasks
        # back-fill the first's straggler tail (guide §2.6). Crash
        # exposure is unchanged: a failed overwrite leaves a partial
        # store whichever order the writes ran in, and the recovery path
        # is a rebuild. Appends stay sequential — interleaved appends
        # would let a crash publish bucket rows with no matching vector
        # rows in a LIVE store, which the sequential order bounds.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            for fut in [pool.submit(_write_buckets), pool.submit(_write_vectors)]:
                fut.result()
    else:
        _write_buckets()
        _write_vectors()
    if mode == "overwrite":
        # One 4-int JSON row: written driver-side through the Hadoop FS
        # API instead of a Spark job — a createDataFrame + coalesce(1)
        # .write.json of a single row measured ~5 s at sf0.1 (whole-job
        # scheduling + local-collection round trip for four integers;
        # guide §5: the driver should do almost no data work, and this IS
        # driver work). spark.read.json reads the bare file identically.
        _write_json_file(
            spark,
            f"{path}/meta/meta.json",
            {"n_bits": n_bits, "n_tables": n_tables, "dim": dim, "seed": seed},
        )


def append_to_embedding_index(
    df: DataFrame, id_col: str, vec_col: str, path: str
) -> None:
    """Add vectors to an existing embedding index under ITS parameters
    (read from the meta file — the caller cannot drift the bucketing)."""
    meta = _read_embedding_meta(df.sparkSession, path)
    write_embedding_index(
        df,
        id_col,
        vec_col,
        path,
        meta["n_bits"],
        meta["n_tables"],
        meta["dim"],
        meta["seed"],
        mode="append",
    )


def _write_json_file(spark: SparkSession, path: str, payload: dict) -> None:
    """Write one JSON object as a single file via the Hadoop FS API (no
    Spark job; works on any FS the session can reach). Overwrites."""
    import json as _json

    fs, hpath, _ = _fs_for(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(_json.dumps(payload).encode("utf-8")))
    finally:
        out.close()


def _read_embedding_meta(spark: SparkSession, path: str) -> dict:
    row = spark.read.json(f"{path}/meta").first()
    return {
        "n_bits": int(row["n_bits"]),
        "n_tables": int(row["n_tables"]),
        "dim": int(row["dim"]),
        "seed": int(row["seed"]),
    }


def incremental_embedding_near_dups(
    spark: SparkSession,
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    threshold: float = 0.9,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Cosine near-dup pairs between a new vector batch and (persisted
    corpus ∪ itself) — (id1, id2, cosine, vs) with id1 < id2, ``vs`` as in
    :func:`incremental_near_dup_pairs`. Same shuffle discipline: the
    batch's buckets broadcast into the store probe (corpus scanned, never
    shuffled), verification is candidate-volume with the store's vector
    fetch partition-pruned by id-hash bucket, and exact cosine makes
    precision exact (LSH only bounds recall)."""
    meta = _read_embedding_meta(spark, index_path)
    # Lazy pins, same rationale as incremental_near_dup_pairs: the
    # hit-bucket collect below materializes the whole batch chain as one
    # job instead of three.
    new_vecs = new_df.select(
        id_col, F.col(vec_col).cast("array<double>").alias("vec")
    ).localCheckpoint(eager=False)
    new_buckets = _embedding_buckets(
        new_vecs,
        id_col,
        "vec",
        meta["n_bits"],
        meta["n_tables"],
        meta["dim"],
        meta["seed"],
    ).localCheckpoint(eager=False)

    # Batch vs corpus: probe the store, batch side broadcast.
    corpus_buckets = spark.read.parquet(f"{index_path}/buckets")
    probe_side = new_buckets.select(
        F.col(id_col).alias("new_id"), "table_id", "bucket"
    )
    if broadcast_batch:
        probe_side = F.broadcast(probe_side)
    cross_cand = (
        corpus_buckets.select(
            F.col(id_col).alias("old_id"), "table_id", "bucket"
        )
        .join(probe_side, ["table_id", "bucket"])
        .select("new_id", "old_id")
        .distinct()
        .localCheckpoint(eager=False)
    )

    # Batch vs batch: grouped pair emission on the SAME buckets (one
    # exchange instead of a two-sided self-join; see minhash_lsh_pairs).
    batch_postings = (
        new_buckets.groupBy("table_id", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    batch_cand = _posting_pairs(batch_postings).distinct()

    # Verification: exact cosine at candidate volume. Old vectors come
    # from the store with directory pruning (same discipline as the text
    # set fetch); batch vectors are the checkpointed batch projection.
    cand_old_ids = cross_cand.select(F.col("old_id").alias(id_col)).distinct()
    hit_buckets = [
        r["set_bucket"]
        for r in cand_old_ids.select(_set_bucket(id_col)).distinct().collect()
    ]
    old_vecs = (
        spark.read.parquet(f"{index_path}/vectors")
        .filter(F.col("set_bucket").isin(hit_buckets or [-1]))
        .join(cand_old_ids, id_col, "left_semi")
        .select(id_col, "vec")
    )
    cos = cosine_pairs_udf()

    def _verify(cand, ids, side_a, sets_a, side_b, sets_b):
        va = sets_a.select(
            F.col(id_col).alias(side_a), F.col("vec").alias("v1")
        )
        vb = sets_b.select(
            F.col(id_col).alias(side_b), F.col("vec").alias("v2")
        )
        # SHUFFLE_HASH: batch/candidate-volume sides; see
        # _verify_cross_pairs.
        return (
            cand.join(va.hint("shuffle_hash"), side_a)
            .join(vb.hint("shuffle_hash"), side_b)
            # Round AFTER the exact kernel. bround, not round: the batch
            # operator rounds with np.round (HALF_EVEN), and Spark's
            # F.round is HALF_UP — on an exactly-representable boundary
            # (e.g. normalized dot 0.78125) the two would disagree by one
            # ulp of the 4-dp grid and break batch-vs-incremental parity.
            .withColumn("cosine", F.bround(cos("v1", "v2"), 4))
            .filter(F.col("cosine") >= threshold)
            .select(
                F.least(side_a, side_b).alias("id1"),
                F.greatest(side_a, side_b).alias("id2"),
                "cosine",
                F.lit(ids).alias("vs"),
            )
        )

    cross_pairs = _verify(
        cross_cand, "corpus", "new_id", new_vecs, "old_id", old_vecs
    )
    batch_pairs = _verify(
        batch_cand, "batch", "id1", new_vecs, "id2", new_vecs
    )
    return cross_pairs.unionByName(batch_pairs)


def incremental_embedding_insert(
    spark: SparkSession,
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    threshold: float = 0.9,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Greedy-insert survivors of a vector batch (policy of
    :func:`incremental_dedup_insert`, pair source =
    :func:`incremental_embedding_near_dups`)."""
    pairs = incremental_embedding_near_dups(
        spark, new_df, id_col, vec_col, index_path, threshold, broadcast_batch
    )
    return _greedy_insert(new_df, pairs, id_col)


# ---------------------------------------------------------------------------
# Index compaction — the small-files maintenance pass
# ---------------------------------------------------------------------------
#
# Every append writes its own parquet files into the store; a daily
# increment cadence therefore grows each directory by one file-wave per
# day until probe scans are dominated by file-open overhead and footer
# reads (the classic production small-files failure). Compaction rewrites
# each store directory as one fresh write-wave — same layout, same sort,
# same hive partitioning, byte-equivalent probe results — sized from FILE
# METADATA (no data pre-pass).
#
# Crash contract (single-maintainer, offline — the same assumption as any
# LSH index resize): the swap is rename-based and self-healing. The dance
# is  write {dir}__compacting  ->  rename {dir} to {dir}__old  ->  rename
# {dir}__compacting to {dir}  ->  delete {dir}__old.  A crash before the
# first rename leaves the store untouched (stale __compacting is deleted
# on the next run); a crash between the renames is repaired by
# _heal_swap (restores __old); a crash before the final delete leaves a
# stale __old that the next run clears. On object stores without atomic
# rename (S3) the rename is copy-based and the offline window is longer —
# the contract is unchanged.

_COMPACT_TARGET_BYTES = 128 * 1024 * 1024  # one healthy parquet file


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _dir_bytes(spark: SparkSession, path: str) -> int:
    fs, hpath, _ = _fs_for(spark, path)
    return fs.getContentSummary(hpath).getLength()


def count_parquet_files(spark: SparkSession, path: str) -> int:
    """Data files under ``path`` (recursive) — the compaction metric."""
    fs, hpath, _ = _fs_for(spark, path)
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n += 1
    return n


def _heal_swap(spark: SparkSession, final_dir: str) -> None:
    """Recover from a crash mid-swap: a lingering __old with no live dir
    is restored; lingering work dirs are cleared."""
    fs, hpath, jvm = _fs_for(spark, final_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    old, tmp = Path(final_dir + "__old"), Path(final_dir + "__compacting")
    if fs.exists(old) and not fs.exists(hpath):
        fs.rename(old, hpath)
    if fs.exists(tmp):
        fs.delete(tmp, True)
    if fs.exists(old):
        fs.delete(old, True)


def _swap_in(spark: SparkSession, final_dir: str) -> None:
    fs, hpath, jvm = _fs_for(spark, final_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    old, tmp = Path(final_dir + "__old"), Path(final_dir + "__compacting")
    if not fs.rename(hpath, old):
        raise IOError(f"compaction swap: cannot move {final_dir} aside")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"compaction swap: cannot install {final_dir}")
    fs.delete(old, True)


def _compact_dir(
    spark: SparkSession,
    dir_path: str,
    sort_cols: list[str] | None = None,
    partition_col: str | None = None,
) -> None:
    _heal_swap(spark, dir_path)
    df = spark.read.parquet(dir_path)
    tmp = dir_path + "__compacting"
    if partition_col is not None:
        # One task per hive bucket -> one file per directory (the
        # original writer's wave pattern over the unioned data).
        out = df.repartition(partition_col)
        out.write.partitionBy(partition_col).mode("overwrite").parquet(tmp)
    else:
        n = max(1, -(-_dir_bytes(spark, dir_path) // _COMPACT_TARGET_BYTES))
        out = df.repartition(n)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(tmp)
    _swap_in(spark, dir_path)


def compact_minhash_index(spark: SparkSession, path: str) -> dict:
    """Rewrite a text index's store directories as single write-waves;
    probe results are unchanged (pinned by test). Returns per-directory
    file counts before/after for the maintenance log."""
    stats = {}
    for sub, sort_cols, part in (
        ("buckets", ["band_id", "band_hash"], None),
        ("sets", None, "set_bucket"),
    ):
        d = f"{path}/{sub}"
        before = count_parquet_files(spark, d)
        _compact_dir(spark, d, sort_cols, part)
        stats[sub] = {
            "files_before": before,
            "files_after": count_parquet_files(spark, d),
        }
    return stats


def compact_embedding_index(spark: SparkSession, path: str) -> dict:
    """:func:`compact_minhash_index` for the embedding store (meta file
    untouched — parameters survive compaction by construction)."""
    stats = {}
    for sub, sort_cols, part in (
        ("buckets", ["table_id", "bucket"], None),
        ("vectors", None, "set_bucket"),
    ):
        d = f"{path}/{sub}"
        before = count_parquet_files(spark, d)
        _compact_dir(spark, d, sort_cols, part)
        stats[sub] = {
            "files_before": before,
            "files_after": count_parquet_files(spark, d),
        }
    return stats
