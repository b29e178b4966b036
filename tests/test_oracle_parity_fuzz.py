"""Cross-engine parity fuzz: the text-feature expressions must agree with
their DuckDB oracle formulation on RANDOM hostile strings, not just the
fixture corpus — whitespace runs, \\x0B (whitespace to Java, not to RE2),
padding, empty/whitespace-only docs, CJK, accented latin, punctuation
soup. This is the test class that catches tokenizer-contract drift (a
space-only trim and a Java-\\s split both passed the fixtures for two
rounds before diverging on padded text)."""

from __future__ import annotations

import random
import string

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.functions import text as TX

# No exotic case-folding chars (ß, İ): lower() on those differs across
# engines and the engine contract doesn't depend on them.
POOL = (
    string.ascii_letters + string.digits + ".,;:!?'\"()-$%&"
    + " \t\n\f\r\x0b"  # \x0b deliberately included: a token char, not WS
    + "éüñàç"
    + "中文字符日本語한국"
)
STOPWORDS_SQL = (
    "['the','and','of','to','is','in','that','it','for','with',"
    "'a','an','on','at','by','as']"
)


def _random_docs(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        ln = rng.choice([0, 1, 2, 5, 30, 120, 400])
        body = "".join(rng.choice(POOL) for _ in range(ln))
        # half the docs get word structure so token stats are non-trivial
        if i % 2 == 0:
            words = [
                rng.choice(["the", "cat", "sat", "on", "mat", "cat", "dog"])
                for _ in range(rng.randint(0, 20))
            ]
            body = " ".join(words) + rng.choice(["", " ", "\t", "\n"]) + body
        docs.append(rng.choice(["", " ", "\t\t", "\n"]) + body)
    return docs


def test_text_feature_pack_matches_duckdb_on_random_strings(spark):
    docs = _random_docs(300)
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            TX.token_count("text").alias("ws_tokens"),
            TX.bpe_token_count("text").cast("int").alias("bpe_tokens"),
            TX.doc_fingerprint("text").alias("fingerprint"),
            F.round(TX.dup_word_frac("text"), 4).alias("dup_word_frac"),
            F.round(TX.top_word_frac("text"), 4).alias("top_word_frac"),
            F.round(TX.punct_ratio("text"), 4).alias("punct_ratio"),
            F.round(TX.stopword_ratio("text"), 4).alias("stopword_ratio"),
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, text,
                 LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), x -> x <> '') AS t
          FROM docs
        )
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               LEN(t) AS ws_tokens,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))
                 AS INT) AS bpe_tokens,
               md5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint,
               ROUND((LEN(t) - LEN(LIST_DISTINCT(t))) * 1.0 / GREATEST(LEN(t), 1), 4)
                 AS dup_word_frac,
               ROUND(COALESCE(LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(t),
                         w -> LEN(LIST_FILTER(t, x -> x = w)))), 0)
                     * 1.0 / GREATEST(LEN(t), 1), 4) AS top_word_frac,
               ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                         '[^\\p{{L}}\\p{{N}}\\s]', '', 'g')))
                     * 1.0 / GREATEST(LENGTH(text), 1), 4) AS punct_ratio,
               ROUND(LEN(LIST_FILTER(t, x -> LIST_CONTAINS({STOPWORDS_SQL}, x)))
                     * 1.0 / GREATEST(LEN(t), 1), 4) AS stopword_ratio
        FROM toks ORDER BY doc_id
        """
    ).df().set_index("doc_id").sort_index()

    assert (got["n_chars"] == want["n_chars"]).all()
    assert (got["ws_tokens"] == want["ws_tokens"]).all(), (
        got["ws_tokens"].compare(want["ws_tokens"]).head()
    )
    assert (got["bpe_tokens"] == want["bpe_tokens"]).all(), (
        got["bpe_tokens"].compare(want["bpe_tokens"]).head()
    )
    assert (got["fingerprint"] == want["fingerprint"]).all()
    for col in ("dup_word_frac", "top_word_frac", "punct_ratio", "stopword_ratio"):
        diff = (got[col] - want[col]).abs()
        assert diff.max() <= 2e-4, (col, diff.idxmax(), docs[diff.idxmax()])
