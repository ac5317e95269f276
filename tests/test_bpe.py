"""BPE merge-training: the relational loop vs a direct Python
implementation of Sennrich et al. 2016, plus edge cases the delimiter
encoding must survive."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
)


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE: greedy most-frequent adjacent pair, ties broken
    on (x, y) ascending, merges applied left-to-right non-overlapping."""

    def merge_word(syms, pair):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    state = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rnd in range(1, n_merges + 1):
        pc = collections.Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (x, y), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, x, y, n))
        state = {merge_word(s, (x, y)): c for s, c in state.items()}
    return merges, state


def _docs_from_words(spark, word_counts: dict[str, int]):
    rows = []
    doc_id = 0
    for w, c in word_counts.items():
        for _ in range(c):
            rows.append((doc_id, w))
            doc_id += 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bpe_train_matches_python_reference(spark):
    wc = {
        "low": 5,
        "lower": 2,
        "newest": 6,
        "widest": 3,
        "banana": 4,
        "bandana": 2,
        "a": 7,  # single-symbol word: must not break pair extraction
    }
    docs = _docs_from_words(spark, wc)
    got = [tuple(r) for r in bpe_train(docs, n_merges=10).collect()]
    ref, _state = _py_bpe(wc, 10)
    assert got == ref


def test_bpe_train_overlapping_run_merges_left_to_right(spark):
    # 'aaaa' + merge (a,a): left-to-right non-overlapping -> [aa, aa];
    # 'aaa' -> [aa, a]. Round 2 must then see (aa,aa) and (aa,a).
    wc = {"aaaa": 3, "aaa": 2}
    docs = _docs_from_words(spark, wc)
    got = [tuple(r) for r in bpe_train(docs, n_merges=3).collect()]
    ref, _ = _py_bpe(wc, 3)
    assert got == ref
    assert got[0][1:] == ("a", "a", 3 * 3 + 2 * 2)


def test_bpe_train_degenerate_rounds_are_noops(spark):
    # Vocabulary exhausts after 2 merges ('ab' -> one symbol, 'a' has
    # no pairs): later rounds must produce no merge row AND must not
    # annihilate the state (left-join-on-TRUE guard).
    wc = {"ab": 4, "a": 3}
    docs = _docs_from_words(spark, wc)
    out = bpe_train(docs, n_merges=5)
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, "a", "b", 4)]


def test_bpe_segment_counts(spark):
    wc = {"banana": 2, "band": 1, "an": 3}
    docs = _docs_from_words(spark, wc)
    merges = bpe_train(docs, n_merges=2)
    ref, state = _py_bpe(wc, 2)
    # expected subword count per word from the reference final state
    n_sub = {"".join(s): len(s) for s in state}
    seg = bpe_segment(docs, merges)
    got = {r["doc_id"]: (r["n_tokens"], r["n_subwords"]) for r in seg.collect()}
    # each doc is a single word
    docs_pd = docs.toPandas()
    for _, row in docs_pd.iterrows():
        assert got[row["doc_id"]] == (1, n_sub[row["text"]])


def test_bpe_non_ascii_words_are_excluded(spark):
    # the delimiter-safety invariant: only ^[a-z]+$ enters the vocab,
    # so accented/uppercase/digit tokens never collide with '§'
    docs = spark.createDataFrame(
        [(0, "résumé naïve abc abc"), (1, "ABC 123 abc§x abc")],
        ["doc_id", "text"],
    )
    rows = [tuple(r) for r in bpe_train(docs, n_merges=1).collect()]
    # tokenize() lowercases and splits on non-letters: 'abc§x' splits
    # into 'abc', 'x' (and lowercased 'ABC' -> 'abc'), so 'abc' counts
    # 5, and the winning pair comes from it.
    assert rows[0][1:3] in {("a", "b"), ("b", "c")}
