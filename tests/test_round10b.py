"""Round-10b tail: the classifier calibration table and the
embedding-space MAD outlier audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.catalog_registry import (
    q_op_score_calibration)
from tf_prisma_api_data_ingestion_spark.operators.similarity import (
    embedding_outliers)

SF = "/root/testdata/sf0.001"


class TestScoreCalibration:
    @pytest.fixture(scope="class")
    def cal(self, spark):
        return sorted(q_op_score_calibration(spark, SF).collect(),
                      key=lambda r: r["decile"])

    def test_deciles_partition_the_corpus(self, spark, cal):
        d = spark.read.parquet(f"{SF}/documents.parquet")
        assert [r["decile"] for r in cal] == list(range(1, 11))
        assert sum(r["n_docs"] for r in cal) == d.count()
        # ANSI ntile balance: sizes differ by at most one
        sizes = [r["n_docs"] for r in cal]
        assert max(sizes) - min(sizes) <= 1

    def test_rate_is_half_up_ppm(self, cal):
        for r in cal:
            num = 2 * r["n_pass_gopher"] * 1_000_000 + r["n_docs"]
            assert r["gopher_rate_ppm"] == num // (2 * r["n_docs"])
            assert 0 <= r["n_pass_gopher"] <= r["n_docs"]

    def test_score_mass_monotone_in_decile(self, cal):
        # deciles are ordered BY score, so per-doc mean score must be
        # non-decreasing across deciles (the ranking invariant; the
        # gopher agreement curve is the free variable being measured)
        means = [r["sum_score_micro"] / r["n_docs"] for r in cal]
        assert all(a <= b for a, b in zip(means, means[1:]))


class TestEmbeddingOutliers:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")

    def test_hand_built_outlier(self, spark):
        # cluster 0: nine near-origin vectors + one far point; the far
        # point's |d2 - median| exceeds 3*MAD
        rows = [(i, [0.001 * i, 0.0], 0) for i in range(9)]
        rows.append((9, [5.0, 5.0], 0))
        out = embedding_outliers(self._emb(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n"] == 10
        assert r["n_outliers"] == 1

    def test_tight_cluster_has_no_outliers(self, spark):
        rows = [(i, [1.0, 1.0], 1) for i in range(8)]
        r = embedding_outliers(self._emb(spark, rows)).collect()[0]
        # identical vectors: d2 = 0 for all, MAD = 0, |d - med| = 0
        # which is NOT > 3*0
        assert r["n_outliers"] == 0 and r["median_d2"] == 0.0

    def test_geometric_assignment_crosses_labels(self, spark):
        # a vector LABELED 1 but sitting at label-0's centroid is
        # assigned to cluster 0 (the audit's whole point)
        rows = ([(i, [0.0, 0.0], 0) for i in range(4)]
                + [(10 + i, [10.0, 10.0], 1) for i in range(4)]
                + [(99, [0.0, 0.0], 1)])
        out = {r["cluster"]: r
               for r in embedding_outliers(self._emb(spark, rows))
               .collect()}
        assert out[0]["n"] == 5  # the mislabeled vector counts in 0
        assert out[1]["n"] == 4


class TestStreamTokenMeter:
    def test_stream_equals_batch_encoder(self, spark):
        # the in-stream per-occurrence segmentation must total exactly
        # what the batch distinct-word encoder reports
        from tf_prisma_api_data_ingestion_spark.catalog_registry import (
            BPE_DEMO_MERGES)
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode)
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            streaming_token_meter)
        got = {r["source"]: r for r in streaming_token_meter(
            spark, SF, BPE_DEMO_MERGES,
            query_name="stm_test").collect()}
        d = spark.read.parquet(f"{SF}/documents.parquet")
        enc = (bpe_encode(d, BPE_DEMO_MERGES)
               .join(d.select("doc_id", "source"), "doc_id")
               .groupBy("source")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("n_words").alias("w"),
                    F.sum("n_pieces").alias("p")))
        for r in enc.collect():
            g = got[r["source"]]
            assert (g["n_docs"], g["n_words"], g["n_pieces"]) == \
                (r["n"], r["w"], r["p"])

    def test_projection_is_stateless_per_row(self, spark):
        # hand case: the fold chain applies in rank order per word
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            token_meter_projection)
        df = spark.createDataFrame([("table tab qq",)], "text string")
        m = df.select(token_meter_projection(
            F.col("text"), [("t", "a"), ("ta", "b")]).alias("m")) \
            .collect()[0]["m"]
        # 'table' -> t a b l e </w> -> ta b l e </w> -> tab l e </w> = 4
        # 'tab'   -> t a b </w> -> ta b </w> -> tab </w>            = 2
        # 'qq'    -> q q </w>                                       = 3
        assert (m["n_words"], m["n_pieces"]) == (3, 9)

    def test_arrow_engine_bit_identical_and_streaming_safe(self, spark):
        # r11: the production-vocabulary meter — same totals as the
        # fold engine per row, and the streaming drain with
        # engine='arrow' matches the fold drain exactly
        from tf_prisma_api_data_ingestion_spark.catalog_registry import (
            BPE_DEMO_MERGES)
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            streaming_token_meter, token_meter_projection)
        df = spark.createDataFrame(
            [("table tab qq",), (None,), ("scatter hash",)],
            "text string")
        fold = df.select(token_meter_projection(
            F.col("text"), BPE_DEMO_MERGES, engine="fold").alias("m"))
        arrow = df.select(token_meter_projection(
            F.col("text"), BPE_DEMO_MERGES, engine="arrow").alias("m"))
        key = lambda r: (r["m"]["n_words"], r["m"]["n_pieces"])
        assert sorted(map(key, fold.collect())) == \
            sorted(map(key, arrow.collect()))
        got_f = sorted(tuple(r) for r in streaming_token_meter(
            spark, SF, BPE_DEMO_MERGES,
            query_name="stm_fold_t", engine="fold").collect())
        got_a = sorted(tuple(r) for r in streaming_token_meter(
            spark, SF, BPE_DEMO_MERGES,
            query_name="stm_arrow_t", engine="arrow").collect())
        assert got_f == got_a

    def test_null_text_meters_as_zero(self, spark):
        # r10 advice: size(NULL array) is -1 under non-ANSI settings —
        # a NULL-text document must contribute (0, 0), matching the
        # batch-twin oracle's COALESCE-to-0 semantics
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            token_meter_projection)
        df = spark.createDataFrame([(None,), ("tab",)], "text string")
        rows = df.select(token_meter_projection(
            F.col("text"), [("t", "a")]).alias("m")).collect()
        got = sorted((r["m"]["n_words"], r["m"]["n_pieces"])
                     for r in rows)
        # 'tab' -> t a b </w> -> ta b </w> = 3 pieces
        assert got == [(0, 0), (1, 3)]
