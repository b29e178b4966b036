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
    mirroring the engine-wide tokenizer (functions.text.tokens: split on
    the shared WS_CLASS, drop empty tokens — so an empty or all-whitespace
    text counts zero tokens). Counting runs of non-WS_CLASS characters is
    that same definition in one findall; a pandas .str.strip() would
    diverge (it strips Python's whitespace set, e.g. \\x0B, which the
    engine/oracle contract deliberately does NOT treat as whitespace —
    see functions.text.WS_CLASS).

    Nullable Int32: a NULL text maps to NULL out (matching the SQL
    equivalent) — .astype('int32') would raise on the NaN a NULL
    produces."""
    from .text import WS_CLASS

    non_ws_run = f"[^{WS_CLASS}]+"
    return texts.str.findall(non_ws_run).str.len().astype("Int32")
