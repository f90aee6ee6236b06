"""Hypothesis property tests for the subword tokenizers: random words
over a small alphabet + random piece tables, checked against the
pure-Python mirrors in tests/test_subword.py. A 3-letter alphabet
makes piece collisions, ties, overlaps, and unk fallbacks dense —
exactly the cases a fixed fixture list misses. One Spark job per
example: words are batched into one DataFrame, max_examples kept low.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from test_subword import py_viterbi, py_wordpiece

from tf_prisma_api_data_ingestion_spark.operators.subword import (
    unigram_viterbi, wordpiece_segment)

WORD = st.text(alphabet="abc", min_size=1, max_size=10)
SCORE = st.integers(min_value=-50, max_value=-1)


@st.composite
def unigram_case(draw):
    # singles for a random SUBSET of the alphabet (missing chars
    # exercise the unk fallback edge), plus random 2-3 char pieces
    singles = draw(st.sets(st.sampled_from("abc"), min_size=1))
    multis = draw(st.sets(st.text(alphabet="abc", min_size=2,
                                  max_size=3), max_size=6))
    pieces = [(p, draw(SCORE)) for p in sorted(singles | multis)]
    words = draw(st.lists(WORD, min_size=1, max_size=12, unique=True))
    return pieces, words


@settings(max_examples=6, deadline=None)
@given(unigram_case())
def test_unigram_viterbi_matches_mirror(spark, case):
    pieces, words = case
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: (r["score_micro"], r["n_pieces"],
                       list(r["pieces"]))
           for r in unigram_viterbi(df, pieces,
                                    max_word_len=8).collect()}
    for w in words:
        assert got[w] == py_viterbi(w, pieces, max_word_len=8), (
            w, pieces)


@st.composite
def wordpiece_case(draw):
    starts = draw(st.sets(st.text(alphabet="abc", min_size=1,
                                  max_size=3), min_size=1, max_size=8))
    conts = draw(st.sets(st.text(alphabet="abc", min_size=1,
                                 max_size=3), max_size=8))
    vocab = sorted(starts) + ["##" + c for c in sorted(conts)]
    words = draw(st.lists(WORD, min_size=1, max_size=12, unique=True))
    return vocab, words


@settings(max_examples=6, deadline=None)
@given(wordpiece_case())
def test_wordpiece_matches_mirror(spark, case):
    vocab, words = case
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: (list(r["pieces"]), r["is_unk"])
           for r in wordpiece_segment(df, vocab,
                                      max_word_len=8).collect()}
    for w in words:
        ps, unk = py_wordpiece(w, vocab, max_word_len=8)
        assert got[w] == (ps, unk), (w, vocab)
