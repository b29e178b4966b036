"""Driver-contract smoke tests: entry() runs, every query runs at sf0.001,
and oracle_sql keys are a subset of queries keys."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "event_count" in df.columns


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    qs = entry_mod.queries()
    assert qs, "registry must not be empty"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        df.limit(5).collect()  # runs without error


def test_oracle_keys_subset_of_queries(spark):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
