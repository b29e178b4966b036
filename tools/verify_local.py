"""Local emulation of the driver's DuckDB-oracle correctness check.

Runs every ``queries()`` entry at a given SF dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet, and compares row count,
column names, and order-insensitive values (float tolerance). Queries with
no oracle get a rows-only sanity run.

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import traceback

import duckdb

# Repo root derived from this file, not hardcoded — the tool must work
# from any checkout location.
sys.path.insert(
    0, __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))
)

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import (  # noqa: E402
    TABLES,
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, colnames):
    """Sort columns by name, then rows; round floats only for stable sort
    keys — value equality itself is checked with math.isclose (see
    rows_equal), not round-then-compare."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def sort_key(v):
        # Floats sort NUMERICALLY at the repo's 4-dp convention (both
        # engines round query outputs to 4 dp, so the key is exact and
        # cross-side order-stable); stringifying a 6-dp rounding flipped
        # order across a digit-count boundary (9.9999994 vs 10.0 sorts
        # '9.999999' after '10.0' lexicographically) and misaligned rows
        # far beyond the compare tolerance.
        # Numerics key UNIFORMLY (not just float): the same column can come
        # back float from Spark but Decimal/int from DuckDB, and mixing a
        # numeric key on one side with a string key on the other would sort
        # the two sides differently and misalign otherwise-matching rows.
        # bool is excluded — Spark/DuckDB agree on bool, and True == 1 as a
        # numeric key would collide distinct values.
        if isinstance(v, (float, int, decimal.Decimal)) and not isinstance(
            v, bool
        ):
            if isinstance(v, float) and math.isnan(v):
                return (2, "NaN")
            # ints key EXACTLY — round(float(v), 4) collapses ints > 2^53
            # to identical keys, misaligning genuinely different id/count
            # rows before the compare even runs. int-vs-float tuple
            # comparison is numeric in Python, so a (1, int) key on one
            # side still sorts consistently against a (1, float) key for
            # the same value on the other.
            if isinstance(v, int):
                return (1, v)
            return (1, round(float(v), 4))
        return (1, str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, *sort_key(x)) for x in t))
    return out, [colnames[i] for i in order]


def _is_num(v) -> bool:
    return isinstance(v, (float, int, decimal.Decimal)) and not isinstance(
        v, bool
    )


def cells_equal(a, b) -> bool:
    # Same uniform-numeric rule as sort_key: a Spark float vs a DuckDB
    # Decimal/int for the same column must compare by VALUE with the
    # float tolerance — Decimal.__eq__ against a binary float is exact
    # and would fail rows the sort just aligned.
    if _is_num(a) and _is_num(b):
        # int-vs-int compares EXACTLY: isclose(9100000, 9100001) is True
        # at rel_tol=1e-6, which would wave through an off-by-one id or
        # count (the planted fixture doc ids live at 9.1M+). Tolerance is
        # only for genuinely inexact arithmetic, i.e. when at least one
        # side is float/Decimal (a Spark double vs a DuckDB Decimal for
        # the same column must still compare by value, not type).
        if isinstance(a, int) and isinstance(b, int):
            return a == b
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-6)
    return a == b


def row_equal(a, b) -> bool:
    return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))


def rows_equal(s_rows, o_rows) -> bool:
    return all(row_equal(a, b) for a, b in zip(s_rows, o_rows))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from aws_snowflake_kinesis_airflow_pipeline_spark.session import get_spark

    spark = get_spark(shuffle_partitions=16)
    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # A typo'd name must not silently verify nothing and exit 0.
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    con = duck_con(sf_dir)

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if name not in oracles:
                print(f"  [rows-only] {name}: {len(srows)} rows OK")
                n_pass += 1
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = [tuple(r) for r in cur.fetchall()]
            s_n, s_c = normalize(srows, scols)
            o_n, o_c = normalize(orows, ocols)
            if s_c != o_c:
                print(f"  [FAIL] {name}: columns {s_c} vs oracle {o_c}")
                n_fail += 1
            elif len(s_n) != len(o_n):
                print(f"  [FAIL] {name}: rowcount {len(s_n)} vs oracle {len(o_n)}")
                n_fail += 1
            elif not rows_equal(s_n, o_n):
                diffs = [
                    (a, b) for a, b in zip(s_n, o_n) if not row_equal(a, b)
                ][:3]
                print(f"  [FAIL] {name}: value mismatch; first diffs: {diffs}")
                n_fail += 1
            else:
                print(f"  [pass] {name}: {len(s_n)} rows")
                n_pass += 1
        except Exception:
            print(f"  [ERROR] {name}:")
            traceback.print_exc()
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
