"""Generate a bench-only sf1 dataset (10x sf0.1) under .scale/sf1/.

The driver provides sf{0.001,0.01,0.1} (TESTDATA.md, read-only). Scale
evidence one decade further out needs lineitem ~6M; this script derives it
from sf0.1 by replicating every table 10x with per-replica key offsets so
all join relationships (lineitem->orders->customer, lineitem->part/supplier,
customer/supplier->nation->region) stay referentially intact. region/nation
are genuine dimensions and stay fixed, as in TPC-H.

Two tables need more than a key shift, or replication would fabricate an
adversarial corpus where every row has 9 exact clones and near-dup pair
outputs grow quadratically instead of linearly:

- documents: every whitespace token in replica i>0 is prefixed "r{i}q"
  (regexp_replace). Within-replica near-dup structure (the planted pairs
  the dedup family finds) is preserved exactly -- token counts, lengths and
  shingle distributions are unchanged in shape -- while cross-replica
  word-shingle Jaccard drops to 0.
- embeddings: hash-derived deterministic noise per (vector, element,
  replica) — uniform in [-0.3, 0.3) — pushes cross-replica cosine below
  near-dup thresholds while keeping within-replica geometry (IVF cluster
  structure, planted duplicates) intact. Two earlier sin-based schemes
  failed measurably: a 0.05 amplitude left cross-replica cosine ~0.96
  (every vector in a 10-clone near-dup group, quadratic pair output), and
  any f(element)+replica-phase form gives the SAME phase shift to every
  element of a replica pair, so ~17% of replica pairs drew nearly
  identical noise and stayed at cosine ~1. Only per-element-decorrelated
  (hash) noise kills both.

Deterministic output (no RNG), idempotent, writes only under .scale/
(gitignored -- this is ~1 GB of derived bench data, not source).

Usage: python tools/make_sf1.py [replicas] [out_dir]
       # defaults: 10 replicas -> .scale/sf1; 100 -> .scale/sf10 etc.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> (key columns to shift, offset = sf0.1 row count of the keyed table)
KEY_SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    # user_id shift added round 9: without it every replica reuses the
    # same 1 500 users, so a 1000x derivation inflates events-per-user
    # 1000x instead of growing the user population — the wrong shape for
    # the event-analytics decade (retention/transition/funnel state is
    # per-user). With the shift, per-user history is replica-identical.
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
DIMS = ("region", "nation")


def replica_select(table: str, cols: list[str], i: int) -> str:
    exprs = []
    for c in cols:
        off = KEY_SHIFTS.get(table, {}).get(c)
        if off is not None and i > 0:
            exprs.append(f"{c} + {off * i} AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            exprs.append(rf"regexp_replace(text, '(\S+)', 'r{i}q\1', 'g') AS text")
        elif table == "embeddings" and c == "embedding" and i > 0:
            exprs.append(
                "list_transform(embedding, (x, el) -> CAST(x + 0.6 * "
                f"((hash(vec_id, el, {i}) % 1000) / 1000.0 - 0.5) AS FLOAT))"
                " AS embedding"
            )
        else:
            exprs.append(c)
    return f"SELECT {', '.join(exprs)} FROM src"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    default_name = f"sf{replicas // 10}" if replicas % 10 == 0 else f"x{replicas}"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", default_name,
    )
    # Optional table subset (comma list), e.g. "documents" for the
    # dedup-family sf100 decade: 1000 replicas of lineitem (600 M rows)
    # neither fits a sane derivation budget nor informs the dedup decade.
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in list(KEY_SHIFTS) + list(DIMS):
        if only is not None and table not in only:
            continue
        src = f"{SRC}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}'")
        cols = [r[0] for r in con.execute("DESCRIBE src").fetchall()]
        n_rep = 1 if table in DIMS else replicas
        if n_rep <= 100:
            union = " UNION ALL ".join(
                replica_select(table, cols, i) for i in range(n_rep)
            )
            con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        else:
            # A 1000-child UNION ALL plan is where DuckDB's planner gets
            # slow; accumulate in chunks through a temp table instead.
            con.execute(
                "CREATE OR REPLACE TABLE _acc AS "
                + replica_select(table, cols, 0)
                + " LIMIT 0"
            )
            for start in range(0, n_rep, 25):
                chunk = " UNION ALL ".join(
                    replica_select(table, cols, i)
                    for i in range(start, min(start + 25, n_rep))
                )
                con.execute(f"INSERT INTO _acc {chunk}")
            con.execute(f"COPY _acc TO '{dst}' (FORMAT PARQUET)")
            con.execute("DROP TABLE _acc")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
