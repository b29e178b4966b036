"""BPE merge-rule induction — the tokenizer-training seam.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units", arXiv:1508.07909): start from characters,
repeatedly merge the most frequent adjacent symbol pair, keep the ordered
merge list as the tokenizer. This module trains that merge list over a
Spark corpus and applies it back distributedly — the missing piece next
to the word-level frequency-rank vocab of :mod:`.encoding` (B42), which
cannot represent unseen words at all; a BPE vocab degrades gracefully to
subwords instead of UNK.

Scale shape (the k-means / bigram-LM fit discipline, similarity.py /
lm.py): BPE's fit state is BOUNDED BY DESIGN — a word-frequency table of
a deterministic bounded sample — so the merge loop runs driver-side over
that table instead of as ``n_merges`` sequential corpus-wide Spark jobs
(merge r+1 depends on merge r, so a distributed loop is n_merges FULL
scans that cannot pipeline; the published trainers are single-node over
word counts for the same reason). Corpus passes:

1. the portable-md5 sample draw (per-partition id top-k + broadcast
   semi-join fetch — lm.py's two-phase form, no text through the driver),
2. ONE tokenize + word-count aggregation, map-side combined to word
   types, capped at ``max_word_types`` rows collected (the operator's
   only driver-side data state — same bounded-collect contract as
   lm.py's vocab and similarity.py's k-means sample).

Everything downstream of the fit is distributed: :func:`bpe_encode`
applies the learned merges corpus-wide in an Arrow-batched pandas_udf
with a per-batch word cache (Zipf makes the cache hit rate ~the corpus'
type/token ratio).

Determinism contract: ties on pair count break by (left, right)
lexicographic ascending, and the word table order cannot affect the
result (counts are summed per pair before the argmax) — the same corpus
always yields the same merge list on any cluster shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .sampling import shuffle_hash

#: End-of-word sentinel symbol. Appended as its OWN symbol after the last
#: character (the paper's convention) so merges can distinguish suffixes
#: from in-word sequences ("est</w>" vs "est"); must not collide with any
#: single character the tokenizer can emit.
END_OF_WORD = "</w>"


def _lower_tokens(text_col: str) -> Column:
    return F.coalesce(
        tokens(F.lower(F.col(text_col))), F.array().cast("array<string>")
    )


def _bpe_fit_on_counts(
    word_counts: list[tuple[str, int]],
    n_merges: int,
    end_of_word: str = END_OF_WORD,
) -> list[tuple[str, str]]:
    """The driver-side merge loop over a (word, count) table.

    Pure function of its input (no Spark): each round counts adjacent
    symbol pairs weighted by word frequency, merges the (count desc,
    pair asc) winner everywhere, and stops early when no pair occurs
    twice (merging a count-1 pair would memorize one word's spelling).
    """
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        syms = tuple(w) + (end_of_word,)
        # Duplicate word rows (caller error) still sum, not overwrite.
        words[syms] = words.get(syms, 0) + c

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        merged = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    return merges


def induce_bpe_merges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 100,
    max_fit_docs: int | None = None,
    max_word_types: int = 100_000,
    fit_seed: int = 0,
    end_of_word: str = END_OF_WORD,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus.

    Returns ``[(left, right), ...]`` in merge order (rank 0 first) — at
    most ``n_merges`` entries, fewer when the sample's pair counts dry up
    (no adjacent pair left with count >= 2).

    ``max_fit_docs``: fit on a bounded deterministic sample drawn by the
    portable-md5 permutation of ``id_col`` (lm.py's two-phase draw: id
    top-k per partition, broadcast semi-join text fetch) — the 100 TB
    form; None fits on the full corpus' word table. ``max_word_types``
    caps the (count desc, word asc) word table the fit collects; rare
    types beyond the cap contribute no merges anyway under the count>=2
    stop rule unless the corpus is pathologically flat.

    Tokenization is the engine-wide lowercased whitespace tokenizer; each
    word contributes its characters plus the ``end_of_word`` sentinel.
    """
    if n_merges < 0:
        raise ValueError("induce_bpe_merges: n_merges must be >= 0")
    src = docs
    if max_fit_docs is not None:
        fit_ids = (
            docs.select(F.col(id_col))
            .orderBy(
                shuffle_hash(F.col(id_col), fit_seed, portable=True),
                F.col(id_col),
            )
            .limit(max_fit_docs)
            # Lazy: materializes inside the word-count collect below.
            .localCheckpoint(eager=False)
        )
        src = docs.select(id_col, text_col).join(
            F.broadcast(fit_ids), id_col, "left_semi"
        )
    counts = (
        src.select(F.explode(_lower_tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("_w").asc())
        .limit(max_word_types)
        .collect()
    )
    return _bpe_fit_on_counts(
        [(r["_w"], r["_c"]) for r in counts], n_merges, end_of_word
    )


def bpe_segment_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    end_of_word: str = END_OF_WORD,
) -> list[str]:
    """Segment one word with a trained merge table: repeatedly apply the
    LOWEST-RANK applicable merge (the standard BPE encoder). Applying
    merges in training order reproduces the training segmentation for
    any word the fit saw, and degrades to characters for unseen words."""
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Append ``out_col``: the document's BPE subword sequence under the
    trained ``merges`` — one Arrow-batched pandas_udf pass, no shuffle.

    The merge table rides into the workers inside the UDF closure (K
    pairs — broadcast-sized by construction); a per-batch word→pieces
    cache makes the per-token cost ~a dict hit for all but each batch's
    first sighting of a type.
    """
    import re

    from ..functions.text import WS_CLASS

    ranks = {p: i for i, p in enumerate(merges)}
    # The engine's pinned whitespace class, NOT str.split(): Python splits
    # on \v and unicode spaces too, which would desynchronize this encoder
    # from tokens()/the fit for documents containing them. WS_CLASS holds
    # regex escape sequences, which Python's re reads identically to the
    # JVM regex tokens() compiles.
    split_re = re.compile("[" + WS_CLASS + "]+")

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_text(t):
            if t is None:
                return []
            out: list[str] = []
            for w in split_re.split(t):
                if not w:
                    continue
                pieces = cache.get(w)
                if pieces is None:
                    pieces = bpe_segment_word(w, ranks, end_of_word)
                    cache[w] = pieces
                out.extend(pieces)
            return out

        return texts.map(enc_text)

    # Case-fold in the JVM (F.lower), the SAME engine the fit's
    # _lower_tokens uses — Python str.lower() diverges from java.lang on
    # locale-sensitive code points (U+0130 İ lowers to 'i̇' in Python,
    # 2 chars), which would segment differently at encode time than the
    # fit saw. Whitespace parity is pinned the same way (WS_CLASS note
    # above); case-fold parity is now structural, not assumed.
    return docs.withColumn(out_col, _enc(F.lower(F.col(text_col))))
