"""Empty-input robustness: every dedup/similarity/text operator must
return an empty, correctly-schemed result on zero rows — not throw
(empty partitions and all-filtered inputs are routine at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id LONG, text STRING")


@pytest.fixture(scope="module")
def empty_vecs(spark):
    return spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")


def test_exact_dedup_empty(spark, empty_docs):
    assert dedup.exact_dedup(empty_docs).count() == 0


def test_ngram_jaccard_empty(spark, empty_docs):
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0


def test_minhash_empty(spark, empty_docs):
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0


def test_simhash_empty(spark, empty_docs):
    assert dedup.simhash_64(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs).count() == 0


def test_clusters_empty(spark, empty_docs):
    pairs = spark.createDataFrame([], "doc_a LONG, doc_b LONG")
    ids = empty_docs.select("doc_id")
    assert dedup.dedup_clusters(pairs, ids).count() == 0


def test_embedding_pairs_empty(spark, empty_vecs):
    v = empty_vecs.withColumn("label", F.lit(0))
    assert dedup.embedding_near_dup_pairs(v, threshold=0.5).count() == 0


def test_embedding_pairs_empty_unblocked(spark, empty_vecs):
    # the LSH delegation infers dim from the first row; empty input must
    # short-circuit to a schema-stable empty frame, not crash
    out = dedup.embedding_near_dup_pairs(empty_vecs, block_col=None,
                                         threshold=0.5)
    assert out.count() == 0
    assert out.columns == ["vec_a", "vec_b", "cos_r"]


def test_brute_force_topk_empty_candidates(spark, empty_vecs):
    q = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>")
    assert similarity.brute_force_topk(q, empty_vecs, k=3).count() == 0


def test_lang_id_and_quality_empty(spark, empty_docs):
    assert text.lang_id(empty_docs).count() == 0
    assert text.quality_features(empty_docs).count() == 0


def test_sessionize_empty(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import sessionize
    df = spark.createDataFrame([], "k STRING, ts LONG")
    assert sessionize(df, "k", "ts", gap=10).count() == 0
