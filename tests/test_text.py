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


def test_repetition_features_hand_computed(spark):
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        repetition_features)
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"),   # 7 3-grams, 3 distinct -> 4/7
         (2, "all distinct words here now"),  # 3 grams, all distinct -> 0
         (3, "short"),               # 1 gram ("short"), distinct -> 0
         (4, "")],                   # no grams -> 0
        "doc_id LONG, text STRING")
    got = {r.doc_id: (r.n_grams, r.n_distinct, round(r.dup_frac, 6))
           for r in repetition_features(df, n=3).collect()}
    assert got[1] == (7, 3, round(4 / 7, 6))
    assert got[2] == (3, 3, 0.0)
    assert got[3] == (1, 1, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_contamination_hand_computed(spark):
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        contamination_hits)
    df = spark.createDataFrame(
        [(0, "the secret benchmark prompt answer pair"),   # benchmark doc
         (1, "contains the secret benchmark prompt answer pair verbatim"),
         (2, "totally unrelated clean training document text")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in contamination_hits(df, n=5, bench_mod=100).collect()}
    assert 0 not in got            # benchmark docs excluded from output
    assert got[1][0] >= 1 and got[1][1] is True
    assert got[2] == (0, False)


def test_pack_sequences_hand_computed(spark):
    from tf_prisma_api_data_ingestion_spark.operators.text import pack_sequences
    df = spark.createDataFrame(
        [(1, "a b c", "s1"),        # 3 tokens -> bin 0 offset 0
         (2, "d e f g", "s1"),      # 4 tokens -> starts at 3: bin 0 offset 3
         (3, "h i", "s1"),          # starts at 7: bin 1 offset 2 (budget 5)
         (10, "x y z", "s2")],      # separate shard packs from 0
        "doc_id LONG, text STRING, source STRING")
    got = {r.doc_id: (r.n_tokens, r.bin_id, r.bin_offset)
           for r in pack_sequences(df, budget=5).collect()}
    assert got[1] == (3, 0, 0)
    assert got[2] == (4, 0, 3)   # spans the bin boundary, starts in bin 0
    assert got[3] == (2, 1, 2)
    assert got[10] == (3, 0, 0)
