"""BM25 / TF-IDF lexical search (operators/search.py).

Pins the operator against a from-scratch pure-Python BM25 on a hand-built
corpus (exact formula replay), hostile inputs (empty docs, NULL text,
no-match queries, repeated query terms), determinism of the top-k cut, and
the plan invariants that make it scale: the df/stats joins broadcast and
the top-k executes as TakeOrderedAndProject.
"""

from __future__ import annotations

import math

import pytest

from aws_snowflake_kinesis_airflow_pipeline_spark.operators.search import (
    bm25_scores,
    bm25_topk,
    tf_idf_vectors,
)

DOCS = [
    (1, "hash join beats merge join on small tables"),
    (2, "merge sort and hash partitioning"),
    (3, "the quick brown fox"),
    (4, "join join join hash"),
    (5, ""),  # empty: counts toward N/avgdl, matches nothing
    (6, None),  # NULL text behaves like empty
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent reference implementation (dict-and-loop, no Spark)."""
    toks = {i: (t or "").lower().split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(t.lower() for t in terms))
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out = {}
    for i, v in toks.items():
        s, matched = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if matched:
            out[i] = (round(s, 4), matched)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_reference_formula(spark, docs_df):
    got = {
        r["doc_id"]: (r["score"], r["n_terms"])
        for r in bm25_scores(docs_df, ["hash", "join"]).collect()
    }
    want = _py_bm25(DOCS, ["hash", "join"])
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1]
        assert math.isclose(got[i][0], want[i][0], abs_tol=1e-4), (i, got[i], want[i])


def test_bm25_repeated_and_cased_terms_dedupe(spark, docs_df):
    a = {r["doc_id"]: r["score"] for r in bm25_scores(docs_df, ["Join", "join", "JOIN"]).collect()}
    b = {r["doc_id"]: r["score"] for r in bm25_scores(docs_df, ["join"]).collect()}
    assert a == b


def test_bm25_no_match_and_empty_query(spark, docs_df):
    assert bm25_scores(docs_df, ["zebra"]).count() == 0
    with pytest.raises(ValueError):
        bm25_scores(docs_df, [])


def test_topk_deterministic_and_ranked(spark, docs_df):
    rows = bm25_topk(docs_df, ["hash", "join"], 3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    # doc 4 is join-heavy and short: must outrank everything
    assert rows[0]["doc_id"] == 4
    again = bm25_topk(docs_df, ["hash", "join"], 3).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in again]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_plan_broadcasts_stats_and_takeordered(spark, docs_df):
    plan = bm25_topk(docs_df, ["hash", "join"], 5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # df/stats sides broadcast
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts
    # postings are checkpointed, so the visible plan shuffles only the
    # tiny df-by-term aggregate and the final per-doc score aggregate
    assert plan.count("Exchange hashpartitioning") <= 2


def test_tf_idf_vectors_formula_and_vocab_cap(spark, docs_df):
    rows = tf_idf_vectors(docs_df, vocab_size=2).collect()
    terms = {r["term"] for r in rows}
    assert len(terms) == 2  # capped vocabulary
    # 'hash' (df=3) tops the cap; 'join' (df=2, docs 1+4) wins the df=2
    # tie against 'merge' on term order
    assert terms == {"hash", "join"}
    n = len(DOCS)
    for r in rows:
        if r["term"] == "join" and r["doc_id"] == 4:
            # tf=3 in doc 4, df=2 → weight = 3 * ln(6/2)
            assert math.isclose(r["weight"], round(3 * math.log(n / 2), 4), abs_tol=1e-4)


def test_rank_window_input_is_pre_limited(spark, docs_df):
    # The rank window rides above GlobalLimit k in the optimized plan —
    # the invariant that makes its single-partition execution safe (and
    # its WindowExec silence honest) at any corpus size.
    plan = (
        bm25_topk(docs_df, ["hash", "join"], 5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    w = plan.index("Window")
    assert "GlobalLimit 5" in plan[w:], plan
