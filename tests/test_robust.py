"""Robust MAD outlier statistics (operators/robust.py).

Pins: exact values against a pure-Python median/MAD on hand-built groups
(planted outliers), NULL handling, the eps guard's direction, robustness
property (one huge corruption does not move the flag threshold the way it
moves a mean), and partition invariance.
"""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.operators.robust import (
    grouped_mad_outliers,
)

# Group a: tight cluster around 10 with two planted outliers.
# Group b: symmetric values, no outliers at z=3.
A = [9.0, 9.5, 10.0, 10.0, 10.5, 11.0, 10.2, 9.8, 50.0, -30.0]
B = [1.0, 2.0, 3.0, 4.0, 5.0]


def _py_mad(vals):
    med = statistics.median(vals)
    mad = statistics.median([abs(x - med) for x in vals])
    return med, mad


@pytest.fixture(scope="module")
def facts(spark):
    rows = [("a", v) for v in A] + [("b", v) for v in B] + [("b", None)]
    return spark.createDataFrame(rows, "grp string, val double")


def test_matches_python_reference(spark, facts):
    got = {
        r["grp"]: (r["median"], r["mad"], r["n_outliers"])
        for r in grouped_mad_outliers(facts, ["grp"], "val").collect()
    }
    for grp, vals in (("a", A), ("b", B)):
        med, mad = _py_mad(vals)
        n_out = sum(1 for x in vals if abs(x - med) > 3 * mad)
        assert got[grp] == (round(med, 4), round(mad, 4), n_out), grp
    assert got["a"][2] == 2 and got["b"][2] == 0


def test_robust_to_single_corruption(spark):
    # Replacing one value with 1e9 must not change median/mad by more than
    # one order-statistic step — the flag threshold stays put, and exactly
    # the corrupt point is flagged.
    clean = [10.0 + i * 0.1 for i in range(20)]
    corrupt = clean[:-1] + [1e9]
    df = spark.createDataFrame(
        [("c", v) for v in corrupt], "grp string, val double"
    )
    r = grouped_mad_outliers(df, ["grp"], "val").first()
    med_clean, mad_clean = _py_mad(clean)
    assert abs(r["median"] - med_clean) < 0.2
    assert abs(r["mad"] - mad_clean) < 0.2
    assert r["n_outliers"] == 1


def test_eps_guard_excludes_boundary(spark):
    # |x - med| == z * mad exactly: strict > already excludes it; with eps
    # the decision moves AWAY from the boundary, never toward it.
    vals = [0.0, 1.0, 2.0, 3.0, 4.0]  # med 2, mad 1 -> threshold 3 -> |4-2|=2 in
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, val double"
    )
    base = grouped_mad_outliers(df, ["grp"], "val", z=2.0).first()
    eps = grouped_mad_outliers(df, ["grp"], "val", z=2.0, eps=0.5).first()
    # at z=2 threshold is exactly 2.0: |0-2|=2 and |4-2|=2 are NOT > 2.
    assert base["n_outliers"] == 0 and eps["n_outliers"] == 0


def test_partition_invariance(spark, facts):
    one = sorted(
        tuple(r) for r in grouped_mad_outliers(facts.coalesce(1), ["grp"], "val").collect()
    )
    many = sorted(
        tuple(r) for r in grouped_mad_outliers(facts.repartition(5), ["grp"], "val").collect()
    )
    assert one == many


def test_approx_exact_below_accuracy(spark, facts):
    # GK digest is exact while the group is smaller than `accuracy`, so at
    # fixture scale approx=True must reproduce the exact branch bit-for-bit.
    exact = sorted(
        tuple(r) for r in grouped_mad_outliers(facts, ["grp"], "val").collect()
    )
    approx = sorted(
        tuple(r)
        for r in grouped_mad_outliers(
            facts, ["grp"], "val", approx=True
        ).collect()
    )
    assert exact == approx


def test_approx_band_above_accuracy(spark):
    # Group larger than `accuracy`: rank error is <= n/accuracy, so with
    # n=2000 and accuracy=100 the outlier count must land within 1% of
    # the group (+1) of the exact count — the band the s1 driver branch
    # asserts.
    n = 2000
    vals = [(i % 997) * 0.5 for i in range(n)]  # heavy repetition + spread
    vals[:20] = [1e6 + i for i in range(20)]  # planted outliers
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, val double")
    ne = grouped_mad_outliers(df, ["grp"], "val").first()["n_outliers"]
    na = grouped_mad_outliers(df, ["grp"], "val", approx=True, accuracy=100).first()[
        "n_outliers"
    ]
    assert abs(na - ne) <= 0.01 * n + 1
    assert ne >= 20  # the planted points are actually flagged


def test_paired_matches_two_single_calls(spark, facts):
    from aws_snowflake_kinesis_airflow_pipeline_spark.operators.robust import (
        grouped_mad_outliers_paired,
    )

    paired = {
        r["grp"]: r for r in grouped_mad_outliers_paired(facts, ["grp"], "val").collect()
    }
    exact = {
        r["grp"]: r for r in grouped_mad_outliers(facts, ["grp"], "val").collect()
    }
    approx = {
        r["grp"]: r
        for r in grouped_mad_outliers(facts, ["grp"], "val", approx=True).collect()
    }
    for g in exact:
        assert (
            paired[g]["median"], paired[g]["mad"], paired[g]["n_outliers"]
        ) == (exact[g]["median"], exact[g]["mad"], exact[g]["n_outliers"])
        assert (
            paired[g]["median_approx"],
            paired[g]["mad_approx"],
            paired[g]["n_outliers_approx"],
        ) == (approx[g]["median"], approx[g]["mad"], approx[g]["n_outliers"])
    assert paired["b"]["n_values"] == len(B)  # NULL not counted
