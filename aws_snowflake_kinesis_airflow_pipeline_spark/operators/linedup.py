"""Corpus-wide line-level dedup: strip boilerplate lines shared by many
documents (SURVEY.md §2 B30).

The CCNet/Dolma pre-training stage between document dedup and quality
filtering: navigation chrome, cookie banners, footers and license
boilerplate repeat across thousands of pages, survive *document*-level
dedup (each page is still unique as a whole), and poison n-gram statistics.
The fix is frequency-based: a line whose DOCUMENT frequency exceeds a
threshold is boilerplate and is removed from every document; each
document's remaining lines are reassembled in their original order.

Scale shape — two corpus-volume equality exchanges, the same budget as
exact dedup:

1. line df: distinct (doc, line) → groupBy(line) count — map-side combine
   bounds the exchange by per-partition distinct lines;
2. filter: lines left-anti-join the hot-line set on line text (equality
   join on the line; no broadcast assumption — the hot set is small by
   construction at sane thresholds, but its size is data-dependent, so the
   planner/AQE decides);
3. reassemble: groupBy(doc) over (position, line) structs, sort_array, and
   rejoin — one exchange keyed by document id.

No step is ever pair-quadratic and no driver-side collection exists at any
size. At 100 TB the df pass would typically hash the line (16-byte
fingerprint) instead of shuffling line bodies; kept as text here because
the operator's oracle covers every byte of the rebuilt documents.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spread import scaled_repartition as _scaled_repartition


def drop_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line_df: int = 3,
    line_sep: str = "\n",
    hot_join_salts: int = 0,
) -> DataFrame:
    """Remove every line whose document frequency exceeds ``max_line_df``.

    Returns one row per input document: ``(id_col, clean_text, n_lines,
    n_kept)`` — the reassembled text (original line order, ``line_sep``
    rejoined; empty string when every line was boilerplate), the original
    line count, and the kept line count. A line's document frequency
    counts each document once however often the line repeats inside it.
    Documents with no text produce ``clean_text = ''``.

    ``hot_join_salts``: the filter's anti-join keys corpus line volume by
    line TEXT, and a viral boilerplate line is by definition a hot key.
    The default path relies on the hot set broadcasting (it is small at
    sane thresholds, and AQE converts to broadcast at runtime from actual
    size); AQE's skew SPLIT cannot reach this join — the hot set is an
    aggregate, which breaks the rule's sort-over-shuffle pattern match
    (pinned in tests/test_skew.py). If the hot set ever outgrows
    broadcast, pass ``hot_join_salts`` > 0 to shard each hot key across
    that many partitions via ``skew.salted_left_anti_join`` —
    row-identical output, pinned by test.
    """
    # coalesce: split(NULL) is NULL and posexplode of NULL emits no rows,
    # which would drop NULL-text documents from the output entirely —
    # the contract is one row per input document, clean_text = ''.
    # re.escape: F.split takes a Java REGEX while array_join below emits
    # the separator literally; an unescaped metacharacter separator
    # (e.g. '|' = empty alternation) would split at every character and
    # reassemble garbage. Python's re.escape emits backslash-punctuation
    # escapes Java regex accepts.
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(re.escape(line_sep)),
                -1,
            )
        ).alias("pos", "line"),
    )
    # Auto-size the two corpus-text-volume exchanges (the per-doc distinct
    # and the reassembly below) to the input — spread.scaled_repartition
    # is a no-op at bench SFs and sizes the final-aggregation partition
    # count to the data at 100x+ (the 5 M-doc decade's lesson). The
    # distinct's exchange keys are exactly its columns, so the explicit
    # hash exchange satisfies its clustering requirement (one exchange).
    hot = (
        _scaled_repartition(lines.select(id_col, "line"), id_col, "line", source=df)
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("line_df"))
        .filter(F.col("line_df") > max_line_df)
        .select("line")
    )
    if hot_join_salts > 0:
        from .skew import salted_left_anti_join

        kept = salted_left_anti_join(lines, hot, "line", hot_join_salts)
    else:
        kept = lines.join(hot, "line", "left_anti")
    rebuilt = _scaled_repartition(kept, id_col, source=df).groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            line_sep,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    # left join: a document whose every line was boilerplate has no kept
    # rows — surface it as an empty document, not a dropped row.
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
