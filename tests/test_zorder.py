"""Z-order layout tests (B33): the skipping property is checked
mechanically from parquet footers — after a two-column z-order write, a
box predicate must intersect few files on BOTH columns, and must beat a
single-column sort layout on the second column. Plus content round-trip
and NULL clustering."""

from __future__ import annotations

import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import load_table
from aws_snowflake_kinesis_airflow_pipeline_spark.operators import zorder


def _file_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per-parquet-file [min,max] per column, read from footers — the same
    stats any footer-reading planner uses to skip."""
    import glob
    import os

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = papq.ParquetFile(f).metadata
        lo: dict[str, float] = {}
        hi: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    if s.min is not None:
                        lo[name] = min(lo.get(name, s.min), s.min)
                        hi[name] = max(hi.get(name, s.max), s.max)
        if lo:
            out.append({c: (lo[c], hi[c]) for c in cols if c in lo})
    return out


def _hit_fraction(ranges, col, pred_lo, pred_hi):
    hits = sum(
        1 for r in ranges if not (r[col][1] < pred_lo or r[col][0] > pred_hi)
    )
    return hits / max(1, len(ranges))


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .cache()
    )


def test_zorder_skips_on_both_dims_and_beats_single_sort(spark, li, tmp_path):
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    cols = ["l_partkey", "l_suppkey"]
    zorder.write_zordered(li, cols, zpath, bits=8, n_files=16)
    # single-column sort baseline, same file count
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    zr = _file_ranges(zpath, cols)
    sr = _file_ranges(spath, cols)
    assert len(zr) >= 8 and len(sr) >= 8

    stats = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).first()
    # a 10%-of-domain box on each column
    p_hi, s_hi = stats["mp"] * 0.1, stats["ms"] * 0.1

    z_part = _hit_fraction(zr, "l_partkey", 0, p_hi)
    z_supp = _hit_fraction(zr, "l_suppkey", 0, s_hi)
    s_part = _hit_fraction(sr, "l_partkey", 0, p_hi)
    s_supp = _hit_fraction(sr, "l_suppkey", 0, s_hi)

    # single-column sort: near-perfect on its own column, useless on the other
    assert s_part <= 0.25
    assert s_supp >= 0.9
    # z-order: substantial skipping on BOTH columns...
    assert z_part <= 0.6, f"z_part={z_part}"
    assert z_supp <= 0.6, f"z_supp={z_supp}"
    # ...and strictly beats the single-sort layout on the second column
    assert z_supp < s_supp


def test_zorder_content_roundtrip(spark, li, tmp_path):
    path = str(tmp_path / "rt")
    zorder.write_zordered(li, ["l_partkey", "l_suppkey"], path, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    a = li.groupBy().agg(
        F.sum("l_orderkey"), F.sum("l_partkey"), F.sum("l_quantity")
    ).first()
    b = back.groupBy().agg(
        F.sum("l_orderkey"), F.sum("l_partkey"), F.sum("l_quantity")
    ).first()
    assert tuple(a) == tuple(b)


def test_zorder_key_is_jvm_only_and_nulls_cluster_first(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (1.0, None), (100.0, 100.0), (1.0, 1.0)],
        "x double, y double",
    )
    cuts = {"x": [1.0, 50.0, 99.0], "y": [1.0, 50.0, 99.0]}
    out = df.select(
        "x", "y", zorder.zorder_key(df, ["x", "y"], bits=2, cuts=cuts)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no UDF anywhere in the key expression
    rows = {(r["x"], r["y"]): r["zkey"] for r in out.collect()}
    # NULL ranks as bucket 0 on its column
    assert rows[(None, 5.0)] < rows[(100.0, 100.0)]
    assert rows[(1.0, None)] < rows[(100.0, 100.0)]
    # interleave is monotone per dimension at equal other-rank
    assert rows[(1.0, 1.0)] < rows[(100.0, 100.0)]
