"""Corpus snapshot diff — added / removed / changed / unchanged.

Continuous corpus maintenance runs against VERSIONS of a corpus (a new
crawl, a re-extraction, a licensing takedown pass). Before re-running the
expensive downstream stages (dedup, quality, packing) a pipeline diffs the
new snapshot against the previous one and feeds only the delta to the
incremental operators (``operators/incremental.py``) — and audits the
takedowns actually landed.

Semantics: rows are keyed by ``id_col``; row content is compared by a
normalized content fingerprint (``functions/text.doc_fingerprint`` — md5
of whitespace-normalized lowercased text), NOT raw equality, so
formatting-only churn (re-wrapped whitespace) classifies as ``unchanged``.
Pass ``raw=True`` to fingerprint the raw bytes instead.

Scale shape: one full outer join on the id — both sides shuffled once on
the key, the same budget as exact dedup. Each side is pre-projected to
(id, 16-byte fingerprint) so the exchange never carries document bodies
(the c1 lesson from round 1). The diff output is (id, status) — join it
back to whichever side's bodies a consumer needs; Catalyst prunes the
other columns out of that scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import doc_fingerprint

STATUSES = ("added", "removed", "changed", "unchanged")


def _prints(df: DataFrame, id_col: str, text_col: str, raw: bool) -> DataFrame:
    fp = (
        F.md5(F.coalesce(F.col(text_col), F.lit("\x00null\x00")))
        if raw
        else doc_fingerprint(F.coalesce(F.col(text_col), F.lit("\x00null\x00")))
    )
    return df.select(F.col(id_col), fp.alias("_fp"))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    raw: bool = False,
) -> DataFrame:
    """(id_col, status) for every id present in either snapshot.

    ``added``     — id only in ``new``
    ``removed``   — id only in ``old``
    ``changed``   — id in both, fingerprints differ
    ``unchanged`` — id in both, fingerprints equal

    ``id_col`` must be unique within each snapshot (the corpus-key
    contract shared with the dedup family — run exact dedup first).
    """
    o = _prints(old, id_col, text_col, raw).withColumnRenamed("_fp", "_fp_old")
    n = _prints(new, id_col, text_col, raw).withColumnRenamed("_fp", "_fp_new")
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Bounded (status, n) rollup of :func:`corpus_diff` — the audit line
    a maintenance run logs before deciding whether the delta is sane
    (e.g. 'changed' suddenly at 90% means the extractor broke, stop)."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))


def delta_for_ingest(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The rows of ``new`` that downstream incremental stages must see:
    added + changed. One diff join plus one semi-join back to bodies."""
    d = corpus_diff(old, new, id_col, text_col).filter(
        F.col("status").isin("added", "changed")
    )
    return new.join(d.select(id_col), id_col, "left_semi")
