"""Incremental near-dup dedup against a persisted MinHash index.

The contract under test: probing a persisted index with a new batch finds
EXACTLY the pairs the batch LSH operator finds on the union corpus
(restricted to pairs touching the batch), the greedy insert policy is
deterministic and idempotent, and the probe plan never shuffles the
corpus-side bucket store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import load_table
from aws_snowflake_kinesis_airflow_pipeline_spark.operators import incremental
from aws_snowflake_kinesis_airflow_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    """documents split ~2:1 into an indexed corpus and a new batch.

    The modulus split interleaves ids, so the fixture's planted near-dup
    groups straddle the boundary — both corpus-vs-batch and batch-internal
    pairs exist (asserted in the equivalence test, so a fixture change
    that vacuates either side fails loudly)."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return docs, corpus, batch


@pytest.fixture(scope="module")
def index_path(spark, corpus_and_batch, tmp_path_factory):
    _, corpus, _ = corpus_and_batch
    path = str(tmp_path_factory.mktemp("mh_index") / "idx")
    incremental.write_minhash_index(corpus, "doc_id", "text", path)
    return path


def _pair_set(df):
    return {(r["id1"], r["id2"], r["jaccard"]) for r in df.collect()}


def test_incremental_pairs_match_batch_operator_on_union(
    spark, corpus_and_batch, index_path
):
    """Index probe ≡ batch LSH on the union, restricted to pairs touching
    the batch: same signature family, same banding, same verification, so
    the pair sets (and jaccard values) must be identical."""
    docs, corpus, batch = corpus_and_batch
    got = incremental.incremental_near_dup_pairs(
        spark, batch, "doc_id", "text", index_path
    )

    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    union_pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    want = {
        (r["id1"], r["id2"], r["jaccard"])
        for r in union_pairs.collect()
        if r["id1"] in batch_ids or r["id2"] in batch_ids
    }
    assert _pair_set(got) == want

    # Non-vacuous on BOTH probe sides.
    by_vs = {r["vs"] for r in got.select("vs").distinct().collect()}
    assert by_vs == {"corpus", "batch"}

    # The 'vs' tag is truthful: corpus pairs touch exactly one batch id.
    for r in got.collect():
        n_batch = (r["id1"] in batch_ids) + (r["id2"] in batch_ids)
        assert n_batch == (1 if r["vs"] == "corpus" else 2)


def test_insert_policy_greedy_and_deterministic(
    spark, corpus_and_batch, index_path
):
    """Survivors = batch minus corpus-dups, minus non-minimum members of
    batch-internal clusters — recomputed independently from the pair list
    in plain Python."""
    _, _, batch = corpus_and_batch
    pairs = incremental.incremental_near_dup_pairs(
        spark, batch, "doc_id", "text", index_path
    ).collect()
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    corpus_dropped = set()
    for r in pairs:
        if r["vs"] == "corpus":
            corpus_dropped |= {r["id1"], r["id2"]} & batch_ids

    # Union-find over batch pairs among the corpus-survivors.
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        if r["vs"] == "batch" and not (
            {r["id1"], r["id2"]} & corpus_dropped
        ):
            ra, rb = find(r["id1"]), find(r["id2"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    cluster_dropped = {x for x in parent if find(x) != x}
    want = batch_ids - corpus_dropped - cluster_dropped

    got = incremental.incremental_dedup_insert(
        spark, batch, "doc_id", "text", index_path
    )
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == want
    assert corpus_dropped and cluster_dropped  # policy non-vacuous


def test_reingest_is_idempotent(spark, corpus_and_batch, tmp_path):
    """Appending survivors then re-running the same batch drops every doc:
    survivors self-match at jaccard 1.0 via the index, non-survivors still
    match whatever dropped them — the reference's idempotent re-ingest
    contract (NOT IN insert) at near-dup granularity."""
    _, corpus, batch = corpus_and_batch
    path = str(tmp_path / "idx")
    incremental.write_minhash_index(corpus, "doc_id", "text", path)
    survivors = incremental.incremental_dedup_insert(
        spark, batch, "doc_id", "text", path
    )
    incremental.append_to_index(survivors, "doc_id", "text", path)

    rerun = incremental.incremental_dedup_insert(
        spark, batch, "doc_id", "text", path
    )
    assert rerun.isEmpty()


def test_append_equals_bulk_index(spark, corpus_and_batch, tmp_path):
    """index(corpus) + append(batch) stores exactly the rows of
    index(corpus ∪ batch) — increments don't drift from a rebuild."""
    docs, corpus, batch = corpus_and_batch
    inc_path, bulk_path = str(tmp_path / "inc"), str(tmp_path / "bulk")
    incremental.write_minhash_index(corpus, "doc_id", "text", inc_path)
    incremental.append_to_index(batch, "doc_id", "text", inc_path)
    incremental.write_minhash_index(docs, "doc_id", "text", bulk_path)

    for sub in ("buckets", "sets"):
        a = spark.read.parquet(f"{inc_path}/{sub}")
        b = spark.read.parquet(f"{bulk_path}/{sub}")
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_probe_plan_broadcasts_batch_and_prunes_sets(
    spark, corpus_and_batch, index_path
):
    """The scale invariants, asserted on the executed plan: (1) the
    corpus-bucket probe is a broadcast join with the BATCH side built —
    the corpus bucket store is scanned, never exchanged; (2) the set-store
    fetch carries a partition filter on set_bucket, so verification reads
    only candidate directories."""
    from aws_snowflake_kinesis_airflow_pipeline_spark.operators.dedup import (
        band_buckets,
        doc_shingles,
        minhash_signatures,
    )

    _, _, batch = corpus_and_batch

    # (1) Probe shape, on the un-checkpointed candidate join (the
    # operator checkpoints it, which hides the join from later plans).
    per_doc = doc_shingles(batch, "doc_id", "text")
    sig = minhash_signatures(batch, "doc_id", "text", per_doc=per_doc)
    new_buckets = band_buckets(sig, "doc_id")
    cand = incremental._cross_candidates(
        spark, new_buckets, index_path, "doc_id", broadcast_batch=True
    )
    cand.write.format("noop").mode("overwrite").save()
    cand_plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [band_id" in cand_plan
    # The corpus store reaches the probe join without ever being hash
    # exchanged on the band keys (the post-join distinct exchange is
    # candidate-volume and allowed).
    assert "Exchange hashpartitioning(band_id" not in cand_plan

    # (2) Verification fetch pruning: the full operator's sets scan
    # carries a partition filter (isin over the collected candidate
    # buckets) — candidate directories are read, not the whole store.
    pairs = incremental.incremental_near_dup_pairs(
        spark, batch, "doc_id", "text", index_path
    )
    pairs.write.format("noop").mode("overwrite").save()
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    part_filter_lines = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "set_bucket" in line
    ]
    assert any(
        "INSET" in line or "IN (" in line for line in part_filter_lines
    )


# --------------------------------------------------------------------------
# Embedding-side incremental index
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb_corpus_and_batch(spark):
    """Corpus/batch split with PLANTED duplicates: the fixture's vectors
    are near-orthogonal (c5's docstring — zero unplanted pairs at 0.9),
    so cross pairs are exact copies of corpus vectors under fresh batch
    ids, and batch-internal pairs are twin copies of batch vectors."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 3 != 0).localCheckpoint()
    originals = emb.filter(F.col("vec_id") % 3 == 0)
    cross_copies = (
        corpus.filter(F.col("vec_id") < 20)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    twin_a = originals.filter(F.col("vec_id") < 15).withColumn(
        "vec_id", F.col("vec_id") + 2_000_000
    )
    twin_b = originals.filter(F.col("vec_id") < 15).withColumn(
        "vec_id", F.col("vec_id") + 3_000_000
    )
    batch = (
        originals.unionByName(cross_copies)
        .unionByName(twin_a)
        .unionByName(twin_b)
        .localCheckpoint()
    )
    return corpus.unionByName(batch), corpus, batch


@pytest.fixture(scope="module")
def emb_index_path(spark, emb_corpus_and_batch, tmp_path_factory):
    _, corpus, _ = emb_corpus_and_batch
    path = str(tmp_path_factory.mktemp("emb_index") / "idx")
    incremental.write_embedding_index(
        corpus, "vec_id", "embedding", path, n_bits=8, n_tables=4
    )
    return path


def test_embedding_incremental_matches_batch_operator(
    spark, emb_corpus_and_batch, emb_index_path
):
    """Probe+verify against the store ≡ the batch LSH operator on the
    union corpus at the index's own parameters, restricted to pairs
    touching the batch — same hyperplanes, same candidates, same exact
    cosine rounded to 4."""
    from aws_snowflake_kinesis_airflow_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb, _, batch = emb_corpus_and_batch
    got = incremental.incremental_embedding_near_dups(
        spark, batch, "vec_id", "embedding", emb_index_path, threshold=0.9
    )
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
    union_pairs = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.9, n_bits=8, n_tables=4
    )
    want = {
        (r["id1"], r["id2"], r["cosine"])
        for r in union_pairs.collect()
        if r["id1"] in batch_ids or r["id2"] in batch_ids
    }
    assert {
        (r["id1"], r["id2"], r["cosine"]) for r in got.collect()
    } == want
    assert want  # fixture plants duplicates across the modulus split
    # both probe sides fired
    assert {r["vs"] for r in got.select("vs").distinct().collect()} == {
        "corpus",
        "batch",
    }


def test_embedding_insert_and_append_roundtrip(
    spark, emb_corpus_and_batch, tmp_path
):
    """Insert survivors, append them, re-run: everything self-matches at
    cosine 1.0 and nothing is re-admitted (meta-file parameters make the
    rebucketing bit-identical)."""
    _, corpus, batch = emb_corpus_and_batch
    path = str(tmp_path / "idx")
    incremental.write_embedding_index(
        corpus, "vec_id", "embedding", path, n_bits=8, n_tables=4
    )
    survivors = incremental.incremental_embedding_insert(
        spark, batch, "vec_id", "embedding", path
    ).localCheckpoint()
    n_surv = survivors.count()
    assert 0 < n_surv < batch.count()  # policy non-vacuous

    incremental.append_to_embedding_index(survivors, "vec_id", "embedding", path)
    rerun = incremental.incremental_embedding_insert(
        spark, batch, "vec_id", "embedding", path
    )
    assert rerun.isEmpty()


@pytest.mark.parametrize("seed", [3, 8])
def test_probe_matches_batch_on_random_corpus(spark, tmp_path, seed):
    """Off-fixture replay of the probe ≡ batch contract (the
    test_oracle_parity_fuzz discipline applied here): a random corpus
    with perturbation-planted near-dups, a random modulus split, the
    full insert → append → replay cycle. Catches anything the fixture's
    particular duplicate structure can't reach (singleton batches,
    duplicate-free buckets, batch-only clusters)."""
    import random

    rng = random.Random(seed)
    words = [
        "the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "blue",
        "sky", "data", "spark", "query", "join", "shuffle", "hash",
    ]
    rows: list[tuple[int, str]] = []
    i = 0
    while i < 120:
        body = " ".join(rng.choice(words) for _ in range(rng.randint(5, 60)))
        rows.append((i, body))
        i += 1
        if rng.random() < 0.3 and i < 120:  # plant a near-dup
            toks = body.split()
            toks[rng.randrange(len(toks))] = rng.choice(words)
            rows.append((i, " ".join(toks)))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = rng.randint(2, 4)
    corpus = docs.filter(F.col("doc_id") % m != 0)
    batch = docs.filter(F.col("doc_id") % m == 0)
    path = str(tmp_path / "idx")
    incremental.write_minhash_index(corpus, "doc_id", "text", path)

    got = _pair_set(
        incremental.incremental_near_dup_pairs(
            spark, batch, "doc_id", "text", path
        )
    )
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        p
        for p in _pair_set(minhash_lsh_pairs(docs, "doc_id", "text"))
        if p[0] in batch_ids or p[1] in batch_ids
    }
    assert got == want

    survivors = incremental.incremental_dedup_insert(
        spark, batch, "doc_id", "text", path
    ).localCheckpoint()
    incremental.append_to_index(survivors, "doc_id", "text", path)
    assert incremental.incremental_dedup_insert(
        spark, batch, "doc_id", "text", path
    ).isEmpty()
    assert incremental.incremental_dedup_insert(
        spark, survivors, "doc_id", "text", path
    ).isEmpty()


def test_compaction_preserves_probes_and_merges_files(spark, tmp_path):
    """Three append waves fragment the store; compaction rewrites each
    directory as one write-wave with probe results byte-identical and
    strictly fewer data files. The embedding store's meta file must
    survive untouched (probes re-bucket with the index's parameters)."""
    docs = load_table(spark, SF_DIR, "documents")
    waves = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    path = str(tmp_path / "idx")
    incremental.write_minhash_index(waves[0], "doc_id", "text", path)
    for w in waves[1:]:
        incremental.append_to_index(w, "doc_id", "text", path)

    probe = waves[3].withColumn("doc_id", F.col("doc_id") + 100000)
    before_pairs = _pair_set(
        incremental.incremental_near_dup_pairs(
            spark, probe, "doc_id", "text", path
        )
    )
    assert before_pairs  # planted duplicates make the probe non-vacuous
    before_files = incremental.count_parquet_files(spark, f"{path}/sets")
    stats = incremental.compact_minhash_index(spark, path)
    assert _pair_set(
        incremental.incremental_near_dup_pairs(
            spark, probe, "doc_id", "text", path
        )
    ) == before_pairs
    assert stats["sets"]["files_before"] == before_files
    for sub in ("buckets", "sets"):
        assert stats[sub]["files_after"] < stats[sub]["files_before"]

    emb = load_table(spark, SF_DIR, "embeddings")
    ewaves = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    epath = str(tmp_path / "eidx")
    incremental.write_embedding_index(
        ewaves[0], "vec_id", "embedding", epath, n_bits=8, n_tables=4
    )
    for w in ewaves[1:]:
        incremental.append_to_embedding_index(w, "vec_id", "embedding", epath)
    eprobe = ewaves[2].withColumn("vec_id", F.col("vec_id") + 100000)

    def _cos_set(df):
        return {(r["id1"], r["id2"], r["cosine"]) for r in df.collect()}

    ebefore = _cos_set(
        incremental.incremental_embedding_near_dups(
            spark, eprobe, "vec_id", "embedding", epath
        )
    )
    assert ebefore  # shifted ids self-match at cosine 1.0
    estats = incremental.compact_embedding_index(spark, epath)
    assert _cos_set(
        incremental.incremental_embedding_near_dups(
            spark, eprobe, "vec_id", "embedding", epath
        )
    ) == ebefore
    for sub in ("buckets", "vectors"):
        assert estats[sub]["files_after"] < estats[sub]["files_before"]


def test_compaction_swap_self_heals(spark, tmp_path):
    """A crash between the two swap renames leaves {dir}__old and no live
    dir; the next compaction (or probe-prep) restores it losslessly."""
    import shutil

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    path = str(tmp_path / "idx")
    incremental.write_minhash_index(docs, "doc_id", "text", path)
    rows_before = spark.read.parquet(f"{path}/buckets").count()

    shutil.move(f"{path}/buckets", f"{path}/buckets__old")  # mid-swap crash
    incremental._heal_swap(spark, f"{path}/buckets")
    assert spark.read.parquet(f"{path}/buckets").count() == rows_before

    # stale work dir from a pre-rename crash is cleared, store untouched
    shutil.copytree(f"{path}/sets", f"{path}/sets__compacting")
    incremental._heal_swap(spark, f"{path}/sets")
    import os

    assert not os.path.exists(f"{path}/sets__compacting")
    assert spark.read.parquet(f"{path}/sets").count() > 0


def test_meta_file_written_driver_side_round_trips(spark, tmp_path):
    """write_embedding_index writes its meta as ONE driver-side JSON file
    (no Spark job — round-13 optimization); the reader must see the exact
    parameters through the same spark.read.json path as before."""
    df = spark.createDataFrame(
        [(1, [1.0] * 4), (2, [0.5] * 4)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "emb_idx")
    incremental.write_embedding_index(
        df, "vec_id", "embedding", path, n_bits=9, n_tables=2, dim=4, seed=7
    )
    meta = incremental._read_embedding_meta(spark, path)
    assert meta == {"n_bits": 9, "n_tables": 2, "dim": 4, "seed": 7}
    import os

    files = os.listdir(f"{path}/meta")
    assert [f for f in files if f.endswith(".json")] == ["meta.json"]


def test_build_index_dir_is_fresh_per_invocation():
    """The c2/c5 in-query index build must never reuse a previous
    invocation's directory (round-12 verdict: a fixture-keyed cache is
    result precomputation, not optimization)."""
    from aws_snowflake_kinesis_airflow_pipeline_spark.plans.llm_suite import (
        _build_index_dir,
    )

    calls = []
    p1 = _build_index_dir("t", calls.append)
    p2 = _build_index_dir("t", calls.append)
    assert p1 != p2  # fresh mkdtemp every invocation
    assert calls == [p1, p2]  # build ran for each
