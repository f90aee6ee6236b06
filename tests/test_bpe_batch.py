"""Batched BPE-training elections (bpe.bpe_elect_batch /
bpe_train_batched — the SentencePiece / YouTokenToMe trainer
speedup): the greedy pairwise symbol-disjoint top-M rule, its
equality with the sequential trainer at batch_m=1 (always) and at
larger batches when the top-M pairs are conflict-free (the
documented approximation's exactness condition)."""

from __future__ import annotations

import pytest

from tf_prisma_api_data_ingestion_spark.operators.bpe import (
    bpe_elect_batch, bpe_train, bpe_train_batched)

SF = "/root/testdata/sf0.001"


def _table(df):
    return [(r["merge_rank"], r["left_sym"], r["right_sym"],
             r["pair_count"])
            for r in df.orderBy("merge_rank").collect()]


def _counts_df(spark, rows):
    return spark.createDataFrame(
        rows, "left_sym string, right_sym string, pair_count long")


class TestElectBatch:
    def test_skips_conflicting_pairs(self, spark):
        pc = _counts_df(spark, [("a", "b", 100), ("b", "c", 99),
                                ("d", "e", 98), ("a", "e", 97),
                                ("f", "g", 96)])
        got = bpe_elect_batch(pc, 3)
        # (b,c) shares b with (a,b); (a,e) shares a and e
        assert got == [("a", "b", 100), ("d", "e", 98), ("f", "g", 96)]

    def test_truncates_when_no_disjoint_pairs_left(self, spark):
        pc = _counts_df(spark, [("a", "b", 10), ("a", "c", 9),
                                ("b", "c", 8)])
        assert bpe_elect_batch(pc, 3) == [("a", "b", 10)]

    def test_tie_break_is_count_desc_then_left_then_right(self, spark):
        pc = _counts_df(spark, [("z", "y", 50), ("a", "b", 50),
                                ("a", "c", 50), ("c", "d", 40)])
        # ties at 50: (a,b) < (a,c) < (z,y); (a,c) then conflicts
        assert bpe_elect_batch(pc, 2) == [("a", "b", 50),
                                          ("z", "y", 50)]

    def test_fetch_deepens_past_conflict_runs(self, spark):
        # 30 conflicting pairs outrank the first disjoint one, forcing
        # the driver slice (max(4m,16)=16 rows) to re-fetch doubled
        rows = [("a", "b", 1000)]
        rows += [("a", f"x{i:02d}", 900 - i) for i in range(30)]
        rows += [("c", "d", 5)]
        got = bpe_elect_batch(_counts_df(spark, rows), 2)
        assert got == [("a", "b", 1000), ("c", "d", 5)]

    def test_invalid_batch_size_raises(self, spark):
        with pytest.raises(ValueError, match="batch size"):
            bpe_elect_batch(_counts_df(spark, [("a", "b", 1)]), 0)


class TestTrainBatched:
    def test_batch_m1_equals_sequential_on_corpus(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        seq = _table(bpe_train(docs, 8))
        bat = _table(bpe_train_batched(docs, 8, batch_m=1))
        assert bat == seq

    def test_batch_equals_sequential_when_top_pairs_disjoint(self, spark):
        # corpus engineered so the exactness condition holds: four
        # symbol-disjoint bigram families (ab/cd/ef/gh) with DIVERSE
        # suffixes, so each merge's newly created pairs split into
        # count-5 slivers that never outrank the batch remainder
        sufs = "ijklmnopqrst"
        docs = []
        fams = [("ab", 20), ("cd", 18), ("ef", 16), ("gh", 14)]
        for fam, n in fams:
            words = [f"{fam}{sufs[i % len(sufs)]}{sufs[(i * 7 + 3) % len(sufs)]}"
                     for i in range(n)]
            for w in words:
                docs.append(" ".join([w] * 5))
        df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                                   "doc_id long, text string")
        seq = _table(bpe_train(df, 4))
        bat = _table(bpe_train_batched(df, 4, batch_m=4))
        assert seq == bat
        assert [(r[1], r[2]) for r in seq] == \
            [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")]

    def test_conflicting_pairs_defer_to_next_round(self, spark):
        # one family only: ('a','b') wins round 1; ('b','</w>') shares
        # b and must NOT ride in the same batch — it reappears (as a
        # changed pair set) in the next round's fresh counts
        df = spark.createDataFrame([(1, "ab ab ab")],
                                   "doc_id long, text string")
        bat = _table(bpe_train_batched(df, 2, batch_m=2))
        assert [(r[1], r[2]) for r in bat] == [("a", "b"),
                                               ("ab", "</w>")]

    def test_rank_numbering_and_truncation(self, spark):
        # 'aa' fully fuses after 2 merges; asking for 8 must truncate
        df = spark.createDataFrame([(1, "aa aa")],
                                   "doc_id long, text string")
        bat = _table(bpe_train_batched(df, 8, batch_m=4))
        assert [r[0] for r in bat] == list(range(1, len(bat) + 1))
        assert len(bat) < 8
