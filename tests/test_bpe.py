"""BPE merge-rule induction (operators/bpe.py, B-extension: the
tokenizer-training seam).

The reference replay here is written independently of the operator (a
from-the-paper reimplementation over a word-count dict) so the two can
only agree by computing the same function; the Sennrich-style fixture's
expected merges were additionally derived BY HAND (see the derivation
comment) so the pinned constants are ground truth, not an
implementation echo.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from aws_snowflake_kinesis_airflow_pipeline_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_segment_word,
    induce_bpe_merges,
)

SETTINGS = settings(max_examples=12, deadline=None)


# --------------------------------------------------------------------------
# Independent reference: straight from the paper's pseudocode.
# --------------------------------------------------------------------------


def ref_bpe(word_counts, n_merges):
    vocab = {}
    for w, c in word_counts:
        key = " ".join(list(w) + [END_OF_WORD])
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for key, c in vocab.items():
            syms = key.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for key, c in vocab.items():
            syms = key.split(" ")
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nk = " ".join(out)
            new_vocab[nk] = new_vocab.get(nk, 0) + c
        vocab = new_vocab
    return merges, vocab


#: The classic subword corpus (low/lower/newest/widest). Hand derivation
#: of the first 8 merges at counts low=5, lower=2, newest=6, widest=3:
#: r1: (e,s)=9 ties (s,t),(t,</w>) -> lexicographic -> 'es'
#: r2: (es,t)=9 ties (t,</w>) -> 'est'
#: r3: (est,</w>)=9 -> 'est</w>'
#: r4: (l,o)=7 ties (o,w) -> 'lo'
#: r5: (lo,w)=7 -> 'low'
#: r6: (e,w)=6 ties (n,e),(w,est</w>) -> 'ew'
#: r7: (ew,est</w>)=6 ties (n,ew) -> 'ewest</w>'
#: r8: (n,ewest</w>)=6 -> 'newest</w>'
SENNRICH_COUNTS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
SENNRICH_MERGES_8 = [
    ("e", "s"),
    ("es", "t"),
    ("est", END_OF_WORD),
    ("l", "o"),
    ("lo", "w"),
    ("e", "w"),
    ("ew", "est" + END_OF_WORD),
    ("n", "ewest" + END_OF_WORD),
]


def _corpus_df(spark, word_counts):
    text = " ".join(w for w, c in word_counts for _ in range(c))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_sennrich_fixture_matches_hand_derivation(spark):
    got = induce_bpe_merges(_corpus_df(spark, SENNRICH_COUNTS), n_merges=8)
    assert got == SENNRICH_MERGES_8
    ref, _ = ref_bpe(SENNRICH_COUNTS, 8)
    assert ref == SENNRICH_MERGES_8


word = st.text(alphabet="abcde", min_size=1, max_size=6)
corpus = st.lists(
    st.tuples(word, st.integers(min_value=1, max_value=9)),
    min_size=1,
    max_size=10,
)


@given(wc=corpus, k=st.integers(min_value=0, max_value=12))
@SETTINGS
def test_operator_matches_reference_replay(spark, wc, k):
    """The Spark fit (sample draw + word-count aggregation + driver loop)
    must equal the paper-pseudocode replay for any corpus and merge
    budget — including early stop when pair counts dry up."""
    # Collapse duplicate word entries the way a corpus would.
    got = induce_bpe_merges(_corpus_df(spark, wc), n_merges=k)
    ref, _ = ref_bpe(wc, k)
    assert got == ref


@given(wc=corpus)
@SETTINGS
def test_encoder_reproduces_training_segmentation(spark, wc):
    """Rank-greedy encoding with the trained table must reproduce the
    training-end segmentation of every fit word (the standard BPE
    round-trip invariant), and each word's pieces must concatenate back
    to word + sentinel (no token ever lost or fabricated)."""
    merges = induce_bpe_merges(_corpus_df(spark, wc), n_merges=20)
    _, final_vocab = ref_bpe(wc, 20)
    training_seg = {
        "".join(k.split(" ")).removesuffix(END_OF_WORD): k.split(" ")
        for k in final_vocab
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wc:
        seg = bpe_segment_word(w, ranks)
        assert "".join(seg) == w + END_OF_WORD
        assert seg == training_seg[w]


def test_bpe_encode_dataframe_pass(spark):
    merges = induce_bpe_merges(_corpus_df(spark, SENNRICH_COUNTS), n_merges=8)
    df = spark.createDataFrame(
        [(1, "newest lowest"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    # 'newest' was fit: full word. 'lowest' was NOT fit: subword pieces
    # 'low' + 'est</w>' — the graceful-degradation property word-level
    # vocabs lack.
    assert rows[1] == ["n" + "ewest" + END_OF_WORD, "low", "est" + END_OF_WORD]
    assert rows[2] == [] and rows[3] == []


def test_encode_case_folds_with_the_fit_engine(spark):
    """Fit and encode must lowercase with the SAME engine (JVM F.lower on
    both paths). U+0130 (İ) is the classic divergence: Python str.lower()
    expands it to 'i' + U+0307 (2 chars) while java.lang.String keeps 1 —
    a Python-side fold would segment fit-seen words differently at encode
    time. The pin: encoding the corpus the fit saw reproduces the fit's
    own segmentation, dotted capital I included."""
    df = spark.createDataFrame(
        [(i, "İstanbul İstanbul newest") for i in range(4)],
        "doc_id long, text string",
    )
    merges = induce_bpe_merges(df, n_merges=12)
    jvm_lower = df.selectExpr("lower('İstanbul') AS w").first()["w"]
    ranks = {p: i for i, p in enumerate(merges)}
    rows = bpe_encode(df.limit(1), merges).first()["bpe_tokens"]
    seg = bpe_segment_word(jvm_lower, ranks)
    # The encoded doc's first word is exactly the fit-engine segmentation
    # of the JVM-lowered word, and the pieces round-trip to it.
    assert rows[: len(seg)] == seg
    assert "".join(seg) == jvm_lower + END_OF_WORD


def test_bounded_sample_and_early_stop(spark):
    # All words unique -> every pair count is 1 -> zero merges.
    df = spark.createDataFrame(
        [(1, "ab cd ef"), (2, "gh ij")], "doc_id long, text string"
    )
    assert induce_bpe_merges(df, n_merges=10) == []
    # max_fit_docs bounds the fit: with a 1-doc sample the merges are a
    # pure function of that one selected doc (portable-md5 order), and
    # the same call is deterministic across invocations.
    big = spark.createDataFrame(
        [(i, "aaa bbb aaa") for i in range(20)], "doc_id long, text string"
    )
    m1 = induce_bpe_merges(big, n_merges=5, max_fit_docs=1)
    m2 = induce_bpe_merges(big, n_merges=5, max_fit_docs=1)
    assert m1 == m2 and m1 == induce_bpe_merges(
        spark.createDataFrame([(1, "aaa bbb aaa")], "doc_id long, text string"),
        n_merges=5,
    )
    with pytest.raises(ValueError):
        induce_bpe_merges(big, n_merges=-1)
