"""Product-quantization (B32) tests: encode contract, ADC recall on
clustered data, graceful degradation on the near-uniform fixture, and the
JVM-only scoring invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import load_table
from aws_snowflake_kinesis_airflow_pipeline_spark.operators import pq, similarity


@pytest.fixture(scope="module")
def emb_df(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _clustered(spark, n_clusters=5, per=40, dim=64, noise=0.05, seed=7):
    import random as rnd

    rng = rnd.Random(seed)
    centroids = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows, vid = [], 0
    for c in centroids:
        for _ in range(per):
            rows.append((vid, [x + rng.gauss(0, noise) for x in c]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return emb, np.array([r[1] for r in rows])


def test_pq_encode_contract(spark, emb_df):
    model = pq.pq_fit(emb_df, "embedding", m=16, n_codes=16, dim=64)
    enc = pq.pq_encode(emb_df, "embedding", model)
    rows = enc.select("vec_id", "pq_codes").collect()
    assert all(len(r["pq_codes"]) == 16 for r in rows)
    assert all(
        0 <= c < 16 for r in rows for c in r["pq_codes"]
    )
    # deterministic: second fit+encode produces identical codes
    model2 = pq.pq_fit(emb_df, "embedding", m=16, n_codes=16, dim=64)
    rows2 = {
        r["vec_id"]: r["pq_codes"]
        for r in pq.pq_encode(emb_df, "embedding", model2).collect()
    }
    assert all(rows2[r["vec_id"]] == r["pq_codes"] for r in rows)


def test_pq_encode_null_and_wrong_length(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, None), (3, [1.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    fit_src = spark.createDataFrame(
        [(i, [float(i + j) for j in range(64)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    model = pq.pq_fit(fit_src, "embedding", m=8, n_codes=4, dim=64)
    got = {
        r["vec_id"]: r["pq_codes"]
        for r in pq.pq_encode(df, "embedding", model).collect()
    }
    assert got[1] is not None and len(got[1]) == 8
    assert got[2] is None and got[3] is None


def test_pq_topk_neighborhood_recall_on_clustered_data(spark):
    """On tight clusters every member quantizes to near-identical codes, so
    ADC cannot resolve the exact within-cluster top-10 ordering (error below
    the quantization cell — inherent to PQ, not a bug). The correct
    criterion is neighborhood recall: every result must come from the
    query's planted cluster, and the ADC score must reflect the ~1.0
    within-cluster cosine."""
    emb, E = _clustered(spark)
    qvec = list(E[0])
    model = pq.pq_fit(emb, "embedding", m=16, n_codes=16, dim=64)
    enc = pq.pq_encode(emb, "embedding", model)
    got = pq.pq_topk(
        model, enc, "vec_id", qvec, k=10, exclude_ids=[0]
    ).collect()
    assert len(got) == 10
    # cluster 0 is ids 0..39
    assert all(r["vec_id"] < 40 for r in got), [r["vec_id"] for r in got]
    assert all(r["adc_cosine"] > 0.95 for r in got)


def test_pq_topk_on_uniform_fixture_returns_valid_topk(spark, emb_df):
    """Near-uniform fixture: valid ordered top-k with nontrivial overlap
    against exact (deterministic fit => pinned floor, measured 0.6)."""
    qvec = [float(x) for x in emb_df.filter("vec_id = 7").first()["embedding"]]
    model = pq.pq_fit(emb_df, "embedding", m=16, n_codes=16, dim=64)
    enc = pq.pq_encode(emb_df, "embedding", model)
    got = pq.pq_topk(model, enc, "vec_id", qvec, k=10, exclude_ids=[7]).collect()
    assert len(got) == 10
    scores = [r["adc_cosine"] for r in got]
    assert scores == sorted(scores, reverse=True)
    exact = [
        r["vec_id"]
        for r in similarity.brute_force_topk(
            emb_df, "embedding", "vec_id", qvec, k=10, exclude_ids=[7]
        ).collect()
    ]
    overlap = len({r["vec_id"] for r in got} & set(exact)) / 10
    assert overlap >= 0.5, f"overlap = {overlap}"


def test_adc_scoring_is_jvm_only(spark, emb_df):
    """The scoring scan must not contain a Python eval node: materialize the
    codes first, then assert the ADC top-k plan is UDF-free and compiles to
    TakeOrderedAndProject."""
    model = pq.pq_fit(emb_df, "embedding", m=16, n_codes=16, dim=64)
    enc_rows = pq.pq_encode(emb_df, "embedding", model).select(
        "vec_id", "pq_codes"
    )
    stored = spark.createDataFrame(
        enc_rows.collect(), "vec_id long, pq_codes array<int>"
    )
    qvec = [float(x) for x in emb_df.filter("vec_id = 7").first()["embedding"]]
    plan = (
        pq.pq_topk(model, stored, "vec_id", qvec, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivf_pq_composition(spark):
    """IVF cells for pruning + PQ codes for in-cell ranking: the composed
    index returns the cluster neighborhood of the query."""
    emb, E = _clustered(spark)
    qvec = list(E[0])
    model_ivf, indexed = similarity.ivf_index(emb, "embedding", n_clusters=5)
    model_pq = pq.pq_fit(emb, "embedding", m=16, n_codes=16, dim=64)
    enc = pq.pq_encode(indexed, "embedding", model_pq)
    import math

    dists = sorted(
        (
            math.dist(c, qvec),
            i,
        )
        for i, c in enumerate(model_ivf.clusterCenters())
    )
    probes = [i for _, i in dists[:2]]
    subset = enc.filter(F.col("ivf_cluster").isin(probes))
    got = [
        r["vec_id"]
        for r in pq.pq_topk(
            model_pq, subset, "vec_id", qvec, k=10, exclude_ids=[0]
        ).collect()
    ]
    # all results come from the query's own planted cluster (ids 0..39)
    assert len(got) == 10 and all(v < 40 for v in got)


def test_pq_fuzz_codes_and_adc_match_numpy(spark):
    """Off-fixture parity: on random vectors (mixed scales, negatives,
    zeros), the Spark encode must equal numpy's per-subspace argmin against
    the SAME codebooks, and the JVM ADC expression must equal the numpy LUT
    sum to float tolerance — catching any drift between the literal-array
    lookup indexing and the codebook layout."""
    import random as rnd

    rng = rnd.Random(11)
    dim, m, n_codes = 32, 8, 8
    rows = []
    for vid in range(120):
        scale = rng.choice([0.01, 1.0, 50.0])
        rows.append(
            (vid, [rng.gauss(0, scale) for _ in range(dim)])
        )
    rows.append((120, [0.0] * dim))  # zero vector: norm 0 -> NULL score
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = pq.pq_fit(emb, "embedding", m=m, n_codes=n_codes, dim=dim)
    enc = {
        r["vec_id"]: r["pq_codes"]
        for r in pq.pq_encode(emb, "embedding", model).collect()
    }
    cb = model.codebooks
    sub = dim // m
    E = {vid: np.asarray(v) for vid, v in rows}
    for vid, v in E.items():
        want = [
            int(
                ((cb[j] - v[j * sub : (j + 1) * sub]) ** 2)
                .sum(axis=1)
                .argmin()
            )
            for j in range(m)
        ]
        assert enc[vid] == want, vid

    qvec = list(E[3])
    got = {
        r["vec_id"]: r["adc_cosine"]
        for r in pq.pq_topk(
            model,
            pq.pq_encode(emb, "embedding", model),
            "vec_id",
            qvec,
            k=121,
        ).collect()
    }
    q = np.asarray(qvec)
    qn = np.linalg.norm(q)
    for vid, codes in enc.items():
        recon = np.concatenate([cb[j][codes[j]] for j in range(m)])
        rn = np.linalg.norm(recon)
        if rn * qn > 0:
            want = round(float(recon @ q / (rn * qn)), 4)
            assert abs(got[vid] - want) <= 1e-3, (vid, got[vid], want)
