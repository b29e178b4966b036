"""Z-order (Morton-curve) clustering for the write path — multi-dimensional
data skipping (B33).

A single-column sort gives tight per-file min/max ranges (and therefore
footer-level file/row-group skipping) on ONE column only; every other
column's range per file stays the full domain. Interleaving the bits of
per-column quantile-bucket ranks produces a key whose sort order keeps
files compact in EVERY clustered dimension at once, so a selective
predicate on any of them prunes most files from the scan. This is the
standard lakehouse layout technique (Delta/Iceberg ``OPTIMIZE ZORDER BY``),
built here from public Spark primitives:

1. **Quantile cuts, one bounded pass**: ``approx_percentile`` (GK digest,
   mergeable, memory bounded) over each clustering column produces
   ``2^bits - 1`` cut points — a driver-side array of a few hundred
   doubles, regardless of table size.
2. **Bucket rank, pure JVM**: each row's rank is a fold over the cut
   literals (``aggregate(cuts, 0, acc + (col >= cut))``) — whole-stage
   codegen, no UDF.
3. **Bit interleave, pure JVM**: ``shiftleft``/``|`` folds build the
   Morton key; NULLs rank 0 (first bucket) so they cluster together.
4. **Layout**: ``repartitionByRange(zkey)`` (global range partitioning —
   one sampling pass, then each output file owns a compact z-range)
   + ``sortWithinPartitions`` + parquet write. File/row-group min-max
   footers then carry tight ranges on every clustered column, which both
   Spark's parquet reader (row-group filter pushdown) and any
   footer-reading planner use to skip.

``tests/test_zorder.py`` pins the skipping property mechanically: after a
two-column z-order write, the fraction of files whose footer [min,max]
intersects a box predicate must be small on BOTH columns — and on the
second column must beat a plain single-column sort layout written from
the same data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_rank(col: Column, cuts: list[float]) -> Column:
    """0-based quantile-bucket rank: count of cut points <= value, as a
    codegen-able fold over literals. NULL -> 0 (clusters NULLs together)."""
    cuts_arr = F.array(*[F.lit(float(c)) for c in cuts])
    rank = F.aggregate(
        cuts_arr,
        F.lit(0),
        lambda acc, c: acc + F.when(col >= c, 1).otherwise(0),
    )
    return F.when(col.isNull(), F.lit(0)).otherwise(rank)


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of rank j lands at position i*n + j."""
    n = len(ranks)
    parts = []
    for j, r in enumerate(ranks):
        r = r.cast("long")
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zkey")


def fit_cuts(
    df: DataFrame, cols: list[str], bits: int = 8, accuracy: int = 10_000
) -> dict[str, list[float]]:
    """One aggregate pass: 2^bits - 1 approx-percentile cut points per
    column (numeric columns; cast upstream for dates/strings)."""
    n_cuts = (1 << bits) - 1
    qs = F.array(
        *[F.lit((i + 1) / (1 << bits)) for i in range(n_cuts)]
    )
    row = df.agg(
        *[
            F.approx_percentile(F.col(c).cast("double"), qs, F.lit(accuracy)).alias(c)
            for c in cols
        ]
    ).first()
    return {c: [float(x) for x in row[c]] for c in cols}


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    cuts: dict[str, list[float]] | None = None,
) -> Column:
    """The Morton key column for ``cols`` (fits cuts if not supplied)."""
    if cuts is None:
        cuts = fit_cuts(df, cols, bits)
    ranks = [
        _bucket_rank(F.col(c).cast("double"), cuts[c]) for c in cols
    ]
    return _interleave(ranks, bits)


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 8,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of ``cols``.

    ``n_files`` sizes the range partitioning — at scale pick
    ``table_bytes / target_file_bytes``. The zkey is dropped from the
    stored schema; it is a layout artifact, not data."""
    zkey = zorder_key(df, cols, bits)
    (
        df.withColumn("_zkey", zkey)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
