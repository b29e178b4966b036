"""UDF escape hatch (SURVEY.md §2 B17 — the reference has no UDF surface;
this demonstrates the engine's slow-path contract).

Policy: built-ins first (every hot-path operator in this engine is pure
``pyspark.sql.functions``); when Python is unavoidable, Arrow-batched
pandas_udf — never row-at-a-time ``@udf``. The demo kernel duplicates a
built-in (whitespace token count) so the oracle can verify the Arrow
round-trip bit-for-bit against SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.IntegerType())
def pd_token_count(texts: pd.Series) -> pd.Series:
    """Vectorized whitespace token count (one Arrow batch per call),
    mirroring the engine-wide tokenizer (functions.text.tokens: trim +
    \\s+ regex split, so an empty text counts one empty token — re.split
    semantics, matching Spark's split and the SQL oracle).

    Nullable Int32: a NULL text maps to NULL out (matching the SQL
    equivalent) — .astype('int32') would raise on the NaN that
    .str.split(None) produces."""
    return (
        texts.str.strip()
        .str.split(r"\s+", regex=True)
        .str.len()
        .astype("Int32")
    )
