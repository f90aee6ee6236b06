"""Equivalence suite for the production-vocabulary tokenizer engines:
engine='fold' (literal plan, oracle-replayable) and engine='arrow'
(mapInPandas, plan size independent of the model) must be
bit-identical on every input — the r10 verdict's item-2 contract.
Covers all three subword families (BPE merges, unigram-LM Viterbi,
WordPiece) on the shared demo models, hand-built adversarial words,
and a synthetic >dial-threshold merge table that forces the auto
engine onto the Arrow path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.catalog_registry import (
    BPE_DEMO_MERGES, UNIGRAM_DEMO_PIECES, WORDPIECE_DEMO_VOCAB)
from tf_prisma_api_data_ingestion_spark.operators.bpe import (
    END_MARK, FOLD_MAX_MERGES, bpe_apply_merges, bpe_encode)
from tf_prisma_api_data_ingestion_spark.operators.subword import (
    FOLD_MAX_PIECES, unigram_encode, unigram_estep, unigram_viterbi,
    wordpiece_encode, wordpiece_segment)

SF = "/root/testdata/sf0.001"

WORDS = ["table", "tables", "a", "ta", "scatter", "hashable",
         "order", "data", "stream", "window", "value", "query",
         "join", "x", "aa", "tab", "batch", "customer",
         "tabletable", "stta"]


def _word_df(spark, extra_col: bool = True):
    rows = [(i, w) for i, w in enumerate(WORDS)]
    return spark.createDataFrame(rows, "wid long, word string")


def _syms_df(spark):
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    return _word_df(spark).withColumn(
        "syms", F.concat(chars, F.array(F.lit(END_MARK))))


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


class TestBpeEngines:
    def test_demo_merges_bit_identical(self, spark):
        d = _syms_df(spark)
        fold = bpe_apply_merges(d, BPE_DEMO_MERGES, engine="fold")
        arrow = bpe_apply_merges(d, BPE_DEMO_MERGES, engine="arrow")
        assert _collect_sorted(fold.select("wid", "word", "syms")) == \
            _collect_sorted(arrow.select("wid", "word", "syms"))

    def test_late_created_lower_rank_pair_is_not_merged(self, spark):
        # the fold chain applies rank 1 BEFORE rank 2 creates new
        # occurrences of rank 1's pair; the arrow kernel must match
        # (this is where a naive GPT-2 min-rank loop diverges):
        # table [('x','yz'), ('y','z')] on 'xyz' -> chars x y z </w>;
        # rank 1 pass: no (x,yz) yet; rank 2 pass: (y,z) -> yz.
        # Final: [x, yz, </w>] — NOT [xyz, </w>].
        merges = [("x", "yz"), ("y", "z")]
        d = spark.createDataFrame([("xyz", ["x", "y", "z", END_MARK])],
                                  "word string, syms array<string>")
        fold = bpe_apply_merges(d, merges, engine="fold").head()["syms"]
        arrow = bpe_apply_merges(d, merges, engine="arrow").head()["syms"]
        assert fold == ["x", "yz", END_MARK]
        assert arrow == fold

    def test_duplicate_pair_and_overlaps(self, spark):
        merges = [("x", "x"), ("a", "b"), ("x", "x")]
        d = spark.createDataFrame(
            [("w1", ["x", "x", "x", "x", "x"]),
             ("w2", ["a", "a", "b", "b"]),
             ("w3", ["a", "b", "a", "b"])],
            "word string, syms array<string>")
        fold = bpe_apply_merges(d, merges, engine="fold")
        arrow = bpe_apply_merges(d, merges, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_encode_engines_identical_on_corpus(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        fold = bpe_encode(docs, BPE_DEMO_MERGES, engine="fold")
        arrow = bpe_encode(docs, BPE_DEMO_MERGES, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_auto_dial_selects_by_model_size(self, spark):
        d = _syms_df(spark)
        small = bpe_apply_merges(d, BPE_DEMO_MERGES, engine="auto")
        assert "MapInPandas" not in small._jdf.queryExecution() \
            .executedPlan().toString()
        big = [(f"s{i}", f"t{i}") for i in range(FOLD_MAX_MERGES + 1)]
        auto = bpe_apply_merges(d, big, engine="auto")
        assert "MapInPandas" in auto._jdf.queryExecution() \
            .executedPlan().toString()

    def test_unknown_engine_raises(self, spark):
        with pytest.raises(ValueError, match="engine"):
            bpe_apply_merges(_syms_df(spark), BPE_DEMO_MERGES,
                             engine="rdd")


class TestUnigramEngines:
    def test_segment_bit_identical(self, spark):
        d = _word_df(spark)
        fold = unigram_viterbi(d, UNIGRAM_DEMO_PIECES, max_word_len=12,
                               engine="fold")
        arrow = unigram_viterbi(d, UNIGRAM_DEMO_PIECES, max_word_len=12,
                                engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_encode_engines_identical_on_corpus(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        fold = unigram_encode(docs, UNIGRAM_DEMO_PIECES, max_word_len=12,
                              engine="fold")
        arrow = unigram_encode(docs, UNIGRAM_DEMO_PIECES,
                               max_word_len=12, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_estep_engines_identical(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        fold = unigram_estep(docs, UNIGRAM_DEMO_PIECES, max_word_len=12,
                             engine="fold")
        arrow = unigram_estep(docs, UNIGRAM_DEMO_PIECES, max_word_len=12,
                              engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_tie_break_parity_on_ambiguous_scores(self, spark):
        # equal total score via equal-scored pieces: 'ab' as piece
        # (-2) vs a(-1)+b(-1) — same score, fewer pieces must win,
        # identically in both engines
        pieces = [("a", -1_000_000), ("b", -1_000_000),
                  ("ab", -2_000_000), ("ba", -2_000_000)]
        d = spark.createDataFrame(
            [("abab",), ("aba",), ("bab",), ("abba",)],
            "word string")
        fold = unigram_viterbi(d, pieces, engine="fold")
        arrow = unigram_viterbi(d, pieces, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)
        got = {r["word"]: r["pieces"] for r in fold.collect()}
        assert got["abab"] == ["ab", "ab"]

    def test_deep_tie_pieces_identical_across_engines(self, spark):
        # deep tie: 'aaab' under {'aa': -1, unk=-100} has two
        # optimal segmentations with equal score, count, AND final
        # piece — the fold's local DP tie-break picks ['a','aa','b']
        # (not the global array argmax ['aa','a','b']); the Arrow
        # kernel must make the identical local choice
        d = spark.createDataFrame([("aaab",), ("aabaa",), ("aaaa",)],
                                  "word string")
        pieces = [("aa", -1_000_000), ("b", -2_000_000)]
        fold = unigram_viterbi(d, pieces, engine="fold")
        arrow = unigram_viterbi(d, pieces, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)
        got = {r["word"]: r["pieces"] for r in fold.collect()}
        assert got["aaab"] == ["a", "aa", "b"]

    def test_auto_dial_selects_by_model_size(self, spark):
        d = _word_df(spark)
        small = unigram_viterbi(d, UNIGRAM_DEMO_PIECES, engine="auto")
        assert "MapInPandas" not in small._jdf.queryExecution() \
            .executedPlan().toString()
        big = ([(f"w{i:04d}", -5_000_000)
                for i in range(FOLD_MAX_PIECES)] + [("a", -1_000_000)])
        auto = unigram_viterbi(d, big, engine="auto")
        assert "MapInPandas" in auto._jdf.queryExecution() \
            .executedPlan().toString()


class TestWordPieceEngines:
    def test_segment_bit_identical(self, spark):
        d = _word_df(spark)
        fold = wordpiece_segment(d, WORDPIECE_DEMO_VOCAB,
                                 max_word_len=12, engine="fold")
        arrow = wordpiece_segment(d, WORDPIECE_DEMO_VOCAB,
                                  max_word_len=12, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_encode_engines_identical_on_corpus(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        fold = wordpiece_encode(docs, WORDPIECE_DEMO_VOCAB,
                                max_word_len=12, engine="fold")
        arrow = wordpiece_encode(docs, WORDPIECE_DEMO_VOCAB,
                                 max_word_len=12, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_pos0_continuation_guard_parity(self, spark):
        # a word literally starting with '##' must not match the
        # continuation piece at position 0 in either engine
        vocab = ["#", "a", "##a", "###"]
        d = spark.createDataFrame([("##a",), ("a",), ("#a",)],
                                  "word string")
        fold = wordpiece_segment(d, vocab, engine="fold")
        arrow = wordpiece_segment(d, vocab, engine="arrow")
        assert _collect_sorted(fold) == _collect_sorted(arrow)

    def test_auto_dial_selects_by_model_size(self, spark):
        d = _word_df(spark)
        small = wordpiece_segment(d, WORDPIECE_DEMO_VOCAB, engine="auto")
        assert "MapInPandas" not in small._jdf.queryExecution() \
            .executedPlan().toString()
        big = list(WORDPIECE_DEMO_VOCAB) + [
            f"zz{i:04d}" for i in range(FOLD_MAX_PIECES)]
        auto = wordpiece_segment(d, big, engine="auto")
        assert "MapInPandas" in auto._jdf.queryExecution() \
            .executedPlan().toString()
