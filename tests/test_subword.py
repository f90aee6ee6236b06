"""Subword segmentation family (operators/subword.py): unigram-LM
Viterbi decode + hard-EM training (Kudo 2018 / SentencePiece) and
WordPiece greedy longest-match-first inference (Schuster & Nakajima
2012 / BERT). Every Spark result is checked against a pure-Python
mirror of the published algorithm, plus hand-math on pinned cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators.subword import (
    UNK, unigram_em_train, unigram_encode, unigram_estep, unigram_mstep,
    unigram_viterbi, wordpiece_encode, wordpiece_segment)

PIECES = [
    ("t", -3_000_000), ("a", -3_500_000), ("b", -4_000_000),
    ("l", -4_200_000), ("e", -3_100_000), ("s", -3_300_000),
    ("ta", -5_000_000), ("tab", -5_500_000), ("ble", -6_000_000),
    ("le", -4_800_000)]

VOCAB = ["t", "a", "s", "ta", "tab", "table", "##le", "##ble", "##s",
         "##a"]


def py_viterbi(word, pieces, unk_score=-100_000_000, max_word_len=24):
    """Reference mirror: exact DP, tie-break (score DESC, n_pieces
    ASC, longer-final-piece / smaller backpointer ASC)."""
    if len(word) > max_word_len or not word:
        return (unk_score, 1, [UNK])
    pm = dict(pieces)
    K = max(len(p) for p, _ in pieces)
    best = [(0, 0, 0, [])]
    for j in range(1, len(word) + 1):
        cands = []
        for l in range(1, min(K, j) + 1):
            sub = word[j - l:j]
            sc = pm.get(sub)
            if sc is None:
                if l != 1:
                    continue
                sc = unk_score
            s, nnp, _, ps = best[j - l]
            cands.append((s + sc, nnp - 1, l - j, ps + [sub]))
        best.append(max(cands))
    s, nnp, _, ps = best[len(word)]
    return (s, -nnp, ps)


def py_wordpiece(word, vocab, max_word_len=24):
    """Reference mirror of BERT's WordpieceTokenizer.tokenize."""
    if len(word) > max_word_len or not word:
        return (["[UNK]"], True)
    vs = set(vocab)
    pos, ps = 0, []
    while pos < len(word):
        end = len(word)
        cur = None
        while pos < end:
            sub = word[pos:end]
            if pos > 0:
                sub = "##" + sub
            if sub in vs and not (pos == 0 and sub.startswith("##")):
                cur = sub
                break
            end -= 1
        if cur is None:
            return (["[UNK]"], True)
        ps.append(cur)
        pos = end
    return (ps, False)


def _words(spark, ws):
    return spark.createDataFrame([(w,) for w in ws], "word string")


class TestUnigramViterbi:
    def test_hand_math_table(self, spark):
        # 'table': tab+le = -10_300_000 beats ta+ble (-11_000_000)
        # and chars (-17_800_000)
        row = unigram_viterbi(_words(spark, ["table"]),
                              PIECES).collect()[0]
        assert row["pieces"] == ["tab", "le"]
        assert row["n_pieces"] == 2
        assert row["score_micro"] == -10_300_000

    def test_matches_python_mirror(self, spark):
        ws = ["table", "tables", "stable", "a", "qq", "ttttt",
              "bleble", "leleta", "x", "tabtab", "else", "be",
              "abstable"]
        got = {r["word"]: (r["score_micro"], r["n_pieces"],
                           r["pieces"])
               for r in unigram_viterbi(_words(spark, ws),
                                        PIECES).collect()}
        for w in ws:
            assert got[w] == py_viterbi(w, PIECES), w

    def test_unk_fallback_chars(self, spark):
        # 'q' has no piece: falls back to unk_score per char, still
        # decodes (Kudo 2018's character coverage)
        row = unigram_viterbi(_words(spark, ["qq"]), PIECES,
                              unk_score=-7).collect()[0]
        assert row["pieces"] == ["q", "q"]
        assert row["score_micro"] == -14

    def test_long_word_rule(self, spark):
        w = "t" * 25
        row = unigram_viterbi(_words(spark, [w]), PIECES,
                              max_word_len=24).collect()[0]
        assert row["pieces"] == [UNK]
        assert row["n_pieces"] == 1
        assert row["score_micro"] == -100_000_000

    def test_tie_break_prefers_fewer_then_longer_final(self, spark):
        # equal char scores make 'aa' vs a+a a pure tie-break case:
        # piece 'aa' at exactly 2x the char score ties on total,
        # wins on fewer pieces
        pieces = [("a", -5), ("aa", -10)]
        row = unigram_viterbi(_words(spark, ["aa"]),
                              pieces).collect()[0]
        assert row["pieces"] == ["aa"]

    def test_dataframe_piece_table(self, spark):
        pdf = spark.createDataFrame(PIECES,
                                    "piece string, score_micro long")
        row = unigram_viterbi(_words(spark, ["table"]),
                              pdf).collect()[0]
        assert row["pieces"] == ["tab", "le"]


class TestUnigramEncode:
    def test_per_doc_totals(self, spark):
        df = spark.createDataFrame(
            [(1, "table table a"), (2, "qq")],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               unigram_encode(df, PIECES).collect()}
        s_t, np_t, _ = py_viterbi("table", PIECES)
        s_a, np_a, _ = py_viterbi("a", PIECES)
        s_q, np_q, _ = py_viterbi("qq", PIECES)
        assert got[1]["n_words"] == 3
        assert got[1]["n_pieces"] == 2 * np_t + np_a
        assert got[1]["score_micro"] == 2 * s_t + s_a
        assert got[2]["n_pieces"] == np_q
        assert got[2]["score_micro"] == s_q


class TestUnigramEstep:
    def test_counts_with_unk_pooling(self, spark):
        df = spark.createDataFrame(
            [(1, "table qq table"), (2, "a")],
            "doc_id long, text string")
        got = {r["piece"]: r["piece_count"] for r in
               unigram_estep(df, PIECES).collect()}
        # table -> tab+le (x2 occurrences), qq -> q+q pooled to unk
        assert got["tab"] == 2 and got["le"] == 2
        assert got["a"] == 1
        assert got[UNK] == 2
        assert got["ble"] == 0  # zero-filled vocab row
        assert set(got) == {p for p, _ in PIECES} | {UNK}

    def test_counts_are_frequency_weighted(self, spark):
        df = spark.createDataFrame(
            [(i, "table") for i in range(5)], "doc_id long, text string")
        got = {r["piece"]: r["piece_count"] for r in
               unigram_estep(df, PIECES).collect()}
        assert got["tab"] == 5 and got["le"] == 5


class TestUnigramTrain:
    def test_mstep_math(self):
        scored = dict(unigram_mstep(
            [("a", 3), ("bb", 1), ("cc", 0), (UNK, 0)], min_count=1))
        # cc pruned (multi-char, zero count); a and unk add-one
        assert "cc" not in scored
        total = 4 + 1 + 1
        assert scored["a"] == int(round(math.log(4 / total) * 1e6))
        assert scored["bb"] == int(round(math.log(1 / total) * 1e6))
        assert scored[UNK] == int(round(math.log(1 / total) * 1e6))

    def test_em_matches_python_mirror(self, spark):
        texts = ["table table stable a", "tables ble qq",
                 "able table a ble"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = unigram_em_train(df, PIECES, n_rounds=2)

        # pure-Python mirror of the same hard-EM loop
        from collections import Counter
        freq = Counter(w for t in texts for w in t.lower().split())
        pairs = list(PIECES)
        for _ in range(2):
            cnt = Counter()
            vocab = {p for p, _ in pairs}
            for w, f in freq.items():
                _, _, ps = py_viterbi(w, pairs)
                for p in ps:
                    cnt[p if p in vocab else UNK] += f
            counts = [(p, cnt.get(p, 0)) for p, _ in pairs]
            counts.append((UNK, cnt.get(UNK, 0)))
            pairs = [(p, s) for p, s in unigram_mstep(counts)
                     if p != UNK]
        assert sorted(got) == sorted(pairs)

    def test_em_improves_likelihood(self, spark):
        texts = ["table table stable a", "tables ble qq",
                 "able table a ble"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        trained = unigram_em_train(df, PIECES, n_rounds=2)
        before = unigram_encode(df, PIECES).agg(
            F.sum("score_micro")).collect()[0][0]
        after = unigram_encode(df, trained).agg(
            F.sum("score_micro")).collect()[0][0]
        # hard-EM reweights toward used pieces: corpus Viterbi
        # log-likelihood must not degrade
        assert after >= before


class TestWordPiece:
    def test_hand_cases(self, spark):
        got = {r["word"]: (r["pieces"], r["is_unk"]) for r in
               wordpiece_segment(
                   _words(spark, ["table", "tables", "stable", "a",
                                  "qq"]), VOCAB).collect()}
        assert got["table"] == (["table"], False)  # longest start wins
        assert got["tables"] == (["table", "##s"], False)
        assert got["stable"] == (["[UNK]"], True)  # no ##t... chain
        assert got["a"] == (["a"], False)
        assert got["qq"] == (["[UNK]"], True)

    def test_matches_python_mirror(self, spark):
        ws = ["table", "tables", "tablea", "taa", "tata", "ta",
              "ass", "sta", "atable", "t", "s", "q", "tableble"]
        got = {r["word"]: (list(r["pieces"]), r["is_unk"]) for r in
               wordpiece_segment(_words(spark, ws), VOCAB).collect()}
        for w in ws:
            assert got[w] == tuple(
                list(x) if isinstance(x, list) else x
                for x in py_wordpiece(w, VOCAB)), w

    def test_greedy_is_longest_match_first(self, spark):
        # greedy takes 'table' then fails on 'ble' remainder needing
        # a continuation — '##ble' exists so it segments; but 'tab'
        # + '##le' + ... would also work: longest-first is pinned
        row = wordpiece_segment(_words(spark, ["tableble"]),
                                VOCAB).collect()[0]
        assert list(row["pieces"]) == ["table", "##ble"]

    def test_long_word_rule(self, spark):
        w = "a" * 25
        row = wordpiece_segment(_words(spark, [w]), VOCAB,
                                max_word_len=24).collect()[0]
        assert row["is_unk"] and list(row["pieces"]) == ["[UNK]"]

    def test_encode_totals(self, spark):
        df = spark.createDataFrame(
            [(1, "table tables qq"), (2, "a a")],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               wordpiece_encode(df, VOCAB).collect()}
        assert (got[1]["n_words"], got[1]["n_pieces"],
                got[1]["n_unk_words"]) == (3, 4, 1)
        assert (got[2]["n_words"], got[2]["n_pieces"],
                got[2]["n_unk_words"]) == (2, 2, 0)


class TestScaleShape:
    def test_encode_plan_is_join_not_window(self, spark):
        # the encode path must be: corpus shuffle for (doc, word)
        # counts + vocab-sized segmentation + join — no windows, no
        # per-row Python
        df = spark.createDataFrame([(1, "table a")],
                                   "doc_id long, text string")
        plan = unigram_encode(df, PIECES)._jdf.queryExecution() \
                                            .executedPlan().toString()
        assert "Window" not in plan
        assert "PythonUDF" not in plan
        plan2 = wordpiece_encode(df, VOCAB)._jdf.queryExecution() \
                                               .executedPlan().toString()
        assert "Window" not in plan2
        assert "PythonUDF" not in plan2


class TestInputGuards:
    def test_empty_piece_table_raises(self, spark):
        with pytest.raises(ValueError, match="empty"):
            unigram_viterbi(_words(spark, ["a"]), [])

    def test_duplicate_piece_raises(self, spark):
        with pytest.raises(ValueError, match="duplicate"):
            unigram_viterbi(_words(spark, ["a"]),
                            [("a", -1), ("a", -2)])

    def test_empty_string_piece_raises(self, spark):
        with pytest.raises(ValueError, match="empty-string"):
            unigram_viterbi(_words(spark, ["a"]), [("", -1)])

    def test_wordpiece_duplicate_vocab_raises(self, spark):
        with pytest.raises(ValueError, match="duplicate-free"):
            wordpiece_segment(_words(spark, ["a"]), ["a", "a"])

    def test_wordpiece_stemless_vocab_raises(self, spark):
        with pytest.raises(ValueError, match="stem"):
            wordpiece_segment(_words(spark, ["a"]), ["##"])

    def test_wordpiece_single_stemless_entry_raises(self, spark):
        # r10 advice: a lone '##' beside valid pieces must be rejected
        # per-entry, not only when ALL pieces are stemless
        with pytest.raises(ValueError, match="stem"):
            wordpiece_segment(_words(spark, ["a"]), ["a", "##"])

    def test_unk_label_in_piece_table_raises(self, spark):
        # r10 advice: a literal '<unk>' piece would duplicate
        # unigram_estep's zero-fill unk row — identically in the
        # oracle, so the differential gate can't catch it
        with pytest.raises(ValueError, match="unk"):
            unigram_viterbi(_words(spark, ["a"]),
                            [("a", -1), ("<unk>", -2)])
