"""Unit tests for operators/text.py with hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators import text


def _one(spark, s: str):
    return spark.createDataFrame([(1, s)], "doc_id INT, text STRING")


@pytest.mark.parametrize("s,n", [
    ("hello world", 2),
    ("  spaced   out  ", 2),
    ("", 0),
    ("   ", 0),
    ("one", 1),
])
def test_token_count(spark, s, n):
    got = _one(spark, s).select(text.token_count(F.col("text")).alias("n")).first()
    assert got.n == n


def test_bpe_ish_piece_count(spark):
    # "Ab3 x!" -> runs: 'ab', '3', 'x', '!' = 4 pieces
    got = _one(spark, "Ab3 x!").select(
        text.bpe_ish_piece_count(F.col("text")).alias("n")).first()
    assert got.n == 4


@pytest.mark.parametrize("s,lang", [
    ("the cat and the dog in a house", "en"),
    ("der hund und die katze ist nicht da", "de"),
    ("le chat et la maison dans les arbres", "fr"),
    ("el perro y la casa en los arboles es", "es"),
    ("这是 中文 文本", "zh"),
    ("xyzzy qwerty", "en"),  # no markers at all -> en by fixed tie-break
])
def test_lang_id(spark, s, lang):
    got = text.lang_id(_one(spark, s)).first()
    assert got.pred_lang == lang


def test_quality_features_hand_computed(spark):
    # "the cat!!" -> 2 tokens, 8 non-space chars, 2 punct, 9 chars, 1 stopword
    got = text.quality_features(_one(spark, "the cat!!")).first()
    assert got.n_tokens == 2
    assert got.mean_token_len == 8 / 2
    assert got.punct_ratio == 2 / 9
    assert got.stopword_ratio == 1 / 2
    expected = min(1.0, max(0.0, 0.5 * 0.5 * 5 + 0.3 * (1 - 2 / 9) + 0.2 * (2 / 100)))
    assert got.quality_score == pytest.approx(expected, abs=0)


def test_quality_empty_text(spark):
    got = text.quality_features(_one(spark, "")).first()
    assert (got.n_tokens, got.mean_token_len, got.punct_ratio,
            got.stopword_ratio) == (0, 0.0, 0.0, 0.0)


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "HELLO-world")],
        "doc_id INT, text STRING")
    got = text.fingerprint(df).select("fingerprint").distinct().count()
    assert got == 1  # all normalize to "hello world"


def test_normalized(spark):
    got = _one(spark, "  A-B?? c9 ").select(
        text.normalized(F.col("text")).alias("v")).first()
    assert got.v == "a b c9"
