"""Heaps-law vocabulary growth curve (operators/text.vocab_growth):
hand-built bucket accounting, cumulative invariants, determinism, and
the no-corpus-window plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators.text import vocab_growth


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


class TestVocabGrowth:
    def test_hand_accounting_k1(self, spark):
        # k=1: one bucket holding the whole corpus
        df = _docs(spark, ["a b a", "b c"])
        row = vocab_growth(df, k=1).collect()[0]
        assert row["bucket"] == 1
        assert row["n_docs"] == 2
        assert row["n_tokens"] == 5
        assert row["new_words"] == 3  # a, b, c
        assert (row["cum_tokens"], row["cum_words"]) == (5, 3)

    def test_new_words_partition_the_vocab(self, spark):
        df = _docs(spark, [f"w{i} shared" for i in range(20)])
        rows = vocab_growth(df, k=4).collect()
        # every distinct word is new in exactly one bucket
        assert sum(r["new_words"] for r in rows) == 21  # 20 w<i> + shared
        assert sum(r["n_tokens"] for r in rows) == 40
        assert sum(r["n_docs"] for r in rows) == 20

    def test_cumulative_is_running_sum_and_monotone(self, spark):
        df = _docs(spark, [f"x{i % 7} y{i % 3}" for i in range(30)])
        rows = sorted(vocab_growth(df, k=5).collect(),
                      key=lambda r: r["bucket"])
        ct = cw = 0
        for r in rows:
            ct += r["n_tokens"]
            cw += r["new_words"]
            assert (r["cum_tokens"], r["cum_words"]) == (ct, cw)
        # full-corpus totals land in the last bucket's cumulative row
        assert rows[-1]["cum_words"] == 10  # 7 x-words + 3 y-words

    def test_md5_deal_is_scan_order_independent(self, spark):
        texts = [f"t{i % 11} u{i % 5}" for i in range(40)]
        a = _docs(spark, texts)
        b = a.orderBy(F.col("doc_id").desc()).repartition(3)
        ra = sorted(map(tuple, vocab_growth(a, k=4).collect()))
        rb = sorted(map(tuple, vocab_growth(b, k=4).collect()))
        assert ra == rb

    def test_no_corpus_sized_single_window(self, spark):
        # the only windows allowed are over the bounded (bucket, group)
        # local slices and the k-row aggregate frame — never an
        # unpartitioned window over the corpus-sized word/doc frames.
        # exact_ntile's plan contract is tested in test_round10; here we
        # check vocab_growth introduces no unpartitioned corpus window:
        # every Window node must sit above an aggregate or a bucketed
        # partitioning.
        df = _docs(spark, [f"w{i}" for i in range(50)])
        plan = vocab_growth(df, k=10)._jdf.queryExecution() \
                                         .executedPlan().toString()
        assert "PythonUDF" not in plan
        # the local rank window partitions by the range bucket
        assert "partitionBy" not in plan or "_rk_b" in plan
