"""Round-9 batch: hand-built semantics tests for the new operators —
exact-substring dedup boundary/overlap cases (Lee et al. 2022), the BPE
greedy-merge fold vs the paper's left-to-right scan (including the
overlapping-candidate runs the position-based oracle replays), the
learned quality classifier's separation + exact-integer contract, and
the C4 bad-words gate bit."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


# ------------------------------------------------------ dedup-substring

W = "w"  # filler token


def _words(n, tag=""):
    return " ".join(f"{tag}t{i}" for i in range(n))


class TestSubstringDup:
    def test_shared_run_exact_boundary(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            substring_dup_coverage)
        shared = _words(5, "s")  # 5 shared tokens
        a = f"{_words(10, 'a')} {shared}"
        b = f"{_words(10, 'b')} {shared}"
        # min_len=5: the shared 5-token run recurs -> exactly 5 tokens
        # covered in each doc, one span each
        out = {r["doc_id"]: r for r in substring_dup_coverage(
            _docs(spark, [a, b]), min_len=5).collect()}
        assert out[0]["dup_tokens"] == 5 and out[1]["dup_tokens"] == 5
        assert out[0]["n_spans"] == 1 and out[1]["n_spans"] == 1
        # min_len=6: the shared run is one token too short -> nothing
        out6 = substring_dup_coverage(_docs(spark, [a, b]), min_len=6)
        assert out6.agg(F.sum("dup_tokens")).collect()[0][0] == 0

    def test_long_shared_run_full_union(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            substring_dup_coverage)
        # a 9-token shared run with min_len=5 produces 5 overlapping
        # windows whose UNION is all 9 tokens (sum of window lengths
        # would be 25 — the merge must not overcount)
        shared = _words(9, "s")
        a, b = f"{_words(3, 'a')} {shared}", f"{shared} {_words(3, 'b')}"
        out = {r["doc_id"]: r for r in substring_dup_coverage(
            _docs(spark, [a, b]), min_len=5).collect()}
        assert out[0]["dup_tokens"] == 9 and out[0]["n_spans"] == 1
        assert out[1]["dup_tokens"] == 9 and out[1]["n_spans"] == 1

    def test_within_doc_repeat_counts(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            substring_dup_coverage)
        # the duplicated substring occurs twice in the SAME document:
        # both occurrences are covered (the paper dedups self-repeats)
        run = _words(5, "r")
        doc = f"{run} {_words(7, 'x')} {run}"
        out = substring_dup_coverage(_docs(spark, [doc]),
                                     min_len=5).collect()[0]
        assert out["dup_tokens"] == 10 and out["n_spans"] == 2
        assert out["n_tokens"] == 17
        assert out["dup_ppm"] == 10 * 1_000_000 // 17
        assert out["dup_heavy"]  # 588k ppm >= 500k

    def test_short_doc_zero_windows(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            substring_dup_coverage)
        out = substring_dup_coverage(
            _docs(spark, ["a b c", "a b c"]), min_len=5).collect()
        # both docs identical but shorter than min_len: NO duplicated
        # substring of >= 5 tokens exists; rows still emitted with zeros
        assert all(r["dup_tokens"] == 0 and r["n_spans"] == 0 for r in out)
        assert all(r["n_tokens"] == 3 for r in out)

    def test_disjoint_spans_merge_only_overlaps(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            substring_dup_coverage)
        r1, r2 = _words(5, "p"), _words(5, "q")
        a = f"{r1} {_words(6, 'x')} {r2}"
        b = f"{r1} {_words(6, 'y')} {r2}"
        out = {r["doc_id"]: r for r in substring_dup_coverage(
            _docs(spark, [a, b]), min_len=5).collect()}
        assert out[0]["dup_tokens"] == 10 and out[0]["n_spans"] == 2


# --------------------------------------------------------------- BPE


def _vocab(spark, rows):
    return spark.createDataFrame(
        rows, "word string, freq long, syms array<string>")


def _elect(spark, l, r):
    return spark.createDataFrame(
        [(l, r, 1)], "left_sym string, right_sym string, pair_count long")


def _py_greedy(syms, a, b):
    """Reference left-to-right non-overlapping merge scan."""
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


class TestBpe:
    @pytest.mark.parametrize("syms,a,b", [
        (["x", "x", "x"], "x", "x"),            # odd run: greedy takes 1st
        (["x", "x", "x", "x"], "x", "x"),       # even run: both pairs
        (["a", "b", "a", "b"], "a", "b"),       # disjoint candidates
        (["a", "a", "b"], "a", "b"),            # candidate mid-word
        (["a", "b", "b"], "a", "b"),            # merged tail must not chain
        (["q", "a", "b", "a", "b", "q"], "a", "b"),
        (["a"], "a", "b"),                      # single symbol, no pair
        (["b", "a"], "a", "b"),                 # reversed pair, no match
    ])
    def test_fold_equals_greedy_scan(self, spark, syms, a, b):
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_apply_merge)
        out = bpe_apply_merge(_vocab(spark, [("w", 1, syms)]),
                              _elect(spark, a, b)).collect()[0]["syms"]
        assert out == _py_greedy(syms, a, b)

    def test_pair_counts_weighted(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_pair_counts)
        v = _vocab(spark, [("ab", 3, ["a", "b", "</w>"]),
                           ("aab", 2, ["a", "a", "b", "</w>"])])
        got = {(r["left_sym"], r["right_sym"]): r["pair_count"]
               for r in bpe_pair_counts(v).collect()}
        assert got == {("a", "b"): 5, ("b", "</w>"): 5, ("a", "a"): 2}

    def test_elect_tiebreak_pinned(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_elect)
        pc = spark.createDataFrame(
            [("b", "c", 5), ("a", "z", 5), ("a", "b", 5), ("z", "a", 9)],
            "left_sym string, right_sym string, pair_count long")
        top = bpe_elect(pc).collect()[0]
        assert (top["left_sym"], top["right_sym"]) == ("z", "a")
        top2 = bpe_elect(pc.filter("pair_count = 5")).collect()[0]
        # ties: left ASC then right ASC
        assert (top2["left_sym"], top2["right_sym"]) == ("a", "b")

    def test_train_classic_example(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_train)
        # Sennrich-style toy corpus: 'low' x5, 'lowest' x2 -> the first
        # merges must build up 'low' pieces ('l','o')->'lo' then
        # ('lo','w')->'low' (7 occurrences each, beating everything).
        corpus = _docs(spark, ["low " * 5 + "lowest " * 2])
        merges = bpe_train(corpus, n_merges=2).collect()
        got = [(m["merge_rank"], m["left_sym"], m["right_sym"],
                m["pair_count"]) for m in merges]
        assert got[0] == (1, "l", "o", 7)
        assert got[1] == (2, "lo", "w", 7)


# --------------------------------------------- learned quality classifier


class TestQualityClassifier:
    def test_separates_seeded_corpus(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.selection import (
            hashed_linear_score)

        def bucket(tok, buckets=64):
            import hashlib
            return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % buckets

        good_w = {bucket(t): 500 for t in ("alpha", "beta", "gamma")}
        bad_w = {bucket(t): -500 for t in ("junkx", "junky")}
        weights = {b: 0 for b in range(64)} | good_w | bad_w
        docs = _docs(spark, ["alpha beta gamma alpha",
                             "junkx junky junkx junky",
                             "alpha junkx"])
        out = {r["doc_id"]: r for r in hashed_linear_score(
            docs, weights).collect()}
        assert out[0]["pass_quality"] and out[0]["score_mean_micros"] == 500
        assert not out[1]["pass_quality"]
        assert out[1]["score_mean_micros"] == -500
        assert out[2]["score_sum_micros"] == 0  # +500 -500

    def test_halfup_mean_and_bias(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.selection import (
            hashed_linear_score)
        import hashlib

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

        # 3 tokens, sum = 100 -> mean = round(100/3) = 33 (half up);
        # sum = -100 -> mean = -33 (half AWAY from zero)
        w = {bucket("tok"): 100, bucket("neg"): -100}
        docs = _docs(spark, ["tok x y", "neg x y"])
        out = {r["doc_id"]: r for r in hashed_linear_score(
            docs, w).collect()}
        assert out[0]["score_mean_micros"] == 33
        assert out[1]["score_mean_micros"] == -33
        # bias shifts the sum before the mean
        out_b = hashed_linear_score(docs.filter("doc_id = 0"), w,
                                    bias_micros=200).collect()[0]
        assert out_b["score_sum_micros"] == 300
        assert out_b["score_mean_micros"] == 100

    def test_empty_doc_contract(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.selection import (
            hashed_linear_score)
        out = hashed_linear_score(_docs(spark, ["   "]), {0: 7},
                                  bias_micros=42).collect()[0]
        assert out["n_tokens"] == 0
        assert out["score_sum_micros"] == 42
        assert out["score_mean_micros"] == 42  # mean of nothing = bias


# ------------------------------------------------------ C4 bad-words


class TestC4Badwords:
    TEXT_OK = "This line has plenty of words and ends well.\nAnd so on it goes. Until. Done."
    TEXT_BAD = "This line has plenty of spam words and ends well.\nAnd so on it goes. Until. Done."

    def test_gate_bit(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.text import c4_rules
        out = {r["doc_id"]: r for r in c4_rules(
            _docs(spark, [self.TEXT_OK, self.TEXT_BAD]),
            badwords=("spam",)).collect()}
        assert out[0]["r_no_badwords"] and out[0]["pass_c4"]
        assert not out[1]["r_no_badwords"] and not out[1]["pass_c4"]

    def test_token_level_not_substring(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.text import c4_rules
        # 'spamming' contains 'spam' as a substring but is a different
        # TOKEN -> must pass (C4 blocks words, not substrings)
        out = c4_rules(_docs(
            spark, [self.TEXT_OK.replace("plenty", "spamming")]),
            badwords=("spam",)).collect()[0]
        assert out["r_no_badwords"]

    def test_none_keeps_r8_shape(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.text import c4_rules
        out = c4_rules(_docs(spark, [self.TEXT_OK]))
        assert "r_no_badwords" not in out.columns
        assert out.columns[-1] == "pass_c4"


# ------------------------------------------------- C4 span-exact dedup


def _sdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, sentences array<string>")


class TestSpanExactDedup:
    def _run(self, spark, rows, span=3):
        from tf_prisma_api_data_ingestion_spark.operators.text import (
            span_exact_dedup)
        return {r["doc_id"]: r.asDict()
                for r in span_exact_dedup(_sdocs(spark, rows),
                                          span=span).collect()}

    def test_keep_first_cross_doc(self, spark):
        # doc 1 holds the first occurrence of span(a,b,c) -> keeper;
        # doc 2's copy at pos 1 is removed (3 sentences, all covered)
        out = self._run(spark, [
            (1, ["a", "b", "c", "d", "e"]),
            (2, ["a", "b", "c", "q"]),
        ])
        assert out[1]["n_dup_spans"] == 0
        assert out[1]["removed_sentences"] == 0
        assert out[1]["kept_ppm"] == 1_000_000
        assert out[2]["n_dup_spans"] == 1
        assert out[2]["removed_sentences"] == 3
        assert out[2]["kept_ppm"] == 250_000  # 1 of 4 kept

    def test_same_doc_repeat(self, spark):
        # the span repeats INSIDE one doc: pos 1 is keeper, pos 4 removed
        out = self._run(spark, [(7, ["a", "b", "c", "a", "b", "c"])])
        assert out[7]["n_spans"] == 4
        assert out[7]["n_dup_spans"] == 1
        assert out[7]["removed_sentences"] == 3  # positions 4..6

    def test_overlapping_removals_merge(self, spark):
        # doc 2 duplicates doc 1's spans at positions 1 AND 2 ->
        # intervals [1,3] and [2,4] merge to one island of 4 sentences
        out = self._run(spark, [
            (1, ["a", "b", "c", "d"]),
            (2, ["a", "b", "c", "d", "z", "z2", "z3"]),
        ])
        assert out[2]["n_dup_spans"] == 2
        assert out[2]["removed_sentences"] == 4
        assert out[1]["removed_sentences"] == 0

    def test_short_and_empty_docs(self, spark):
        out = self._run(spark, [(1, ["a", "b"]), (2, [])])
        for d in (1, 2):
            assert out[d]["n_spans"] == 0
            assert out[d]["n_dup_spans"] == 0
            assert out[d]["kept_ppm"] == 1_000_000

    def test_tie_is_position_then_doc(self, spark):
        # same span at (doc 5, pos 2) and (doc 6, pos 1): doc 5 has the
        # smaller doc_id -> keeper is (5, 2); doc 6 pos 1 removed
        out = self._run(spark, [
            (5, ["x", "a", "b", "c"]),
            (6, ["a", "b", "c", "y"]),
        ])
        assert out[5]["removed_sentences"] == 0
        assert out[6]["removed_sentences"] == 3


# -------------------------------------------- linear quality probe GD


class TestLinearProbe:
    def _corpus(self, spark):
        good = [(i, "signal alpha beta gamma delta", 1) for i in range(20)]
        bad = [(100 + i, "noise omega psi chi phi", 0) for i in range(20)]
        return spark.createDataFrame(
            good + bad, "doc_id long, text string, label int")

    def test_one_step_matches_hand_math(self, spark):
        # one doc, one token, w0=0: p=0, r=-1e6, grad = divhalf(-1e6*1,1)
        # = -1e6; w1[b] = 0 - divhalf(lr * -1e6, 1e6 * 1) = +lr
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            md5_hash60)
        from tf_prisma_api_data_ingestion_spark.operators.selection import (
            linear_probe_step, probe_features)
        d = spark.createDataFrame([(1, "hello", 1)],
                                  "doc_id long, text string, label int")
        feat = probe_features(d, buckets=8)
        w = {r["bucket"]: r["w_micros"]
             for r in linear_probe_step(feat, {b: 0 for b in range(8)},
                                        buckets=8,
                                        lr_ppm=250_000).collect()}
        b = d.select((md5_hash60(F.lit("hello")) % 8).cast("int")
                     .alias("b")).collect()[0]["b"]
        assert w[b] == 250_000
        assert all(v == 0 for k, v in w.items() if k != b)

    def test_training_separates_seeded_corpus(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.selection import (
            hashed_linear_score, linear_probe_train)
        c = self._corpus(spark)
        w = linear_probe_train(c, rounds=3, buckets=32)
        sc = hashed_linear_score(c, w, buckets=32)
        m = {r["label"]: r["mx"] for r in
             (sc.join(c.select("doc_id", "label"), "doc_id")
              .groupBy("label")
              .agg(F.max("score_mean_micros").alias("mx"))).collect()}
        assert m[1] > m[0]  # positives score strictly higher

    def test_training_is_deterministic(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.selection import (
            linear_probe_train)
        c = self._corpus(spark)
        assert (linear_probe_train(c, rounds=2, buckets=16)
                == linear_probe_train(c, rounds=2, buckets=16))

    def test_weights_feed_inference_unchanged(self, spark):
        # the feature hashing in training and inference is the SAME
        # function: a weight learned for a token's bucket moves that
        # token's inference score by exactly cnt * w / n
        from tf_prisma_api_data_ingestion_spark.operators.selection import (
            hashed_linear_score, linear_probe_train)
        d = spark.createDataFrame([(1, "zork zork", 1)],
                                  "doc_id long, text string, label int")
        w = linear_probe_train(d, rounds=1, buckets=8, lr_ppm=500_000)
        out = hashed_linear_score(d, w, buckets=8).collect()[0]
        # one bucket holds both occurrences: S = 2w, mean = w
        assert out["score_sum_micros"] == 2 * max(w.values())
        assert out["score_mean_micros"] == max(w.values())


# ------------------------------------------------------ winnowing


def _winnow_mirror(text, k, w):
    """Pure-python reimplementation of the operator's spec."""
    import hashlib
    P = 2_147_483_647
    toks = text.lower().split()
    if len(toks) >= k:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    elif toks:
        grams = [" ".join(toks)]
    else:
        grams = []
    hm = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P
          for g in grams]
    enc = [h * 2_147_483_648 + (P - (i + 1)) for i, h in enumerate(hm)]
    sel = {min(enc[max(0, p - w + 1):p + 1]) for p in range(w - 1, len(enc))}
    return grams, sel


class TestWinnowing:
    def _run(self, spark, texts, k=5, w=4):
        from tf_prisma_api_data_ingestion_spark.operators.text import (
            winnow_fingerprints)
        return {r["doc_id"]: r.asDict() for r in winnow_fingerprints(
            _docs(spark, texts), k=k, w=w).collect()}

    def test_matches_python_mirror(self, spark):
        text = "the quick brown fox jumps over the lazy dog the quick brown fox again"
        grams, sel = _winnow_mirror(text, 3, 4)
        out = self._run(spark, [text], k=3, w=4)[0]
        assert out["n_grams"] == len(grams)
        assert out["n_fingerprints"] == len(sel)
        assert out["fp_checksum"] == sum(sel) % 2_305_843_009_213_693_951

    def test_shared_substring_shares_a_fingerprint(self, spark):
        # Schleimer et al. guarantee: a shared run of >= w + k - 1
        # tokens yields a shared selected HASH (positions differ, so
        # compare the decoded hash side of the selections)
        shared = "alpha beta gamma delta epsilon zeta eta"  # 7 >= 4+3-1
        a = "x1 x2 x3 " + shared + " y1 y2"
        b = "z1 " + shared + " w1 w2 w3 w4"
        _, sa = _winnow_mirror(a, 3, 4)
        _, sb = _winnow_mirror(b, 3, 4)
        ha = {e // 2_147_483_648 for e in sa}
        hb = {e // 2_147_483_648 for e in sb}
        assert ha & hb
        out = self._run(spark, [a, b], k=3, w=4)
        assert out[0]["n_fingerprints"] == len(sa)
        assert out[1]["n_fingerprints"] == len(sb)

    def test_density_and_short_docs(self, spark):
        out = self._run(spark, ["a b c", ""], k=5, w=4)
        # 3 tokens < k -> one gram, zero full windows, zero fingerprints
        assert out[0]["n_grams"] == 1 and out[0]["n_fingerprints"] == 0
        assert out[1]["n_grams"] == 0 and out[1]["fp_checksum"] == 0


# ------------------------------------------------------ CCNet buckets


class TestCCNetBuckets:
    def test_tercile_contract(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.text import (
            ccnet_buckets)
        # 6 docs, one source; model fit separates repetitive (high
        # bigram likelihood) from shuffled text
        rows = [(i, "rep rep rep rep rep" if i < 2
                 else f"uni{i}a uni{i}b uni{i}c uni{i}d", "s0")
                for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = ccnet_buckets(df).collect()
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r["ccnet_bucket"], []).append(r["lm_ppm_r"])
        assert sorted(len(v) for v in by_bucket.values()) == [2, 2, 2]
        assert min(by_bucket["head"]) >= max(by_bucket["middle"])
        assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
        # the repetitive docs fit the corpus LM best -> head
        heads = {r["doc_id"] for r in out if r["ccnet_bucket"] == "head"}
        assert heads == {0, 1}

    def test_groups_bucket_independently(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.text import (
            ccnet_buckets)
        rows = [(i, f"tok{i} tok{i} tok{i}", f"s{i % 2}") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = ccnet_buckets(df).collect()
        for src in ("s0", "s1"):
            counts = [r["ccnet_bucket"] for r in out if r["source"] == src]
            assert sorted(set(counts)) == ["head", "middle", "tail"]


# ------------------------------------------------------ B-Cubed eval


class TestBCubed:
    def _ev(self, spark, pred, truth):
        from tf_prisma_api_data_ingestion_spark.operators.ml import (
            bcubed_eval)
        p = spark.createDataFrame(pred, "doc_id long, cluster_id long")
        t = spark.createDataFrame(truth, "doc_id long, cluster_id long")
        return bcubed_eval(p, t).collect()[0].asDict()

    def test_hand_values(self, spark):
        # pred merges truth {1,2} and {3}: P = (2/3+2/3+1/3+1)/4,
        # R = 1 exactly, F1 = 2PR/(P+R) = 0.8
        out = self._ev(spark,
                       [(1, 1), (2, 1), (3, 1), (4, 4)],
                       [(1, 1), (2, 1), (3, 3), (4, 4)])
        assert out["bcubed_precision_ppm"] == 666667  # half-up of 2/3
        assert out["bcubed_recall_ppm"] == 1_000_000
        assert out["bcubed_f1_ppm"] == 800_000
        assert (out["n_pred_clusters"], out["n_truth_clusters"]) == (2, 3)

    def test_identity_is_perfect(self, spark):
        c = [(i, i % 3) for i in range(9)]
        out = self._ev(spark, c, c)
        assert out["bcubed_precision_ppm"] == 1_000_000
        assert out["bcubed_recall_ppm"] == 1_000_000
        assert out["bcubed_f1_ppm"] == 1_000_000

    def test_overmerge_hits_precision_oversplit_hits_recall(self, spark):
        truth = [(1, 1), (2, 1), (3, 3), (4, 3)]
        allone = [(i, 1) for i in (1, 2, 3, 4)]
        singls = [(i, i) for i in (1, 2, 3, 4)]
        merged = self._ev(spark, allone, truth)
        split = self._ev(spark, singls, truth)
        assert merged["bcubed_recall_ppm"] == 1_000_000
        assert merged["bcubed_precision_ppm"] == 500_000
        assert split["bcubed_precision_ppm"] == 1_000_000
        assert split["bcubed_recall_ppm"] == 500_000


# ------------------------------------------------ stupid backoff LM


class TestStupidBackoff:
    def test_all_levels_hand_math(self, spark):
        # ref doc (id 0 = the % 100 == 0 stratum): "a b c a b d"
        # scored doc: exercises every backoff level
        from tf_prisma_api_data_ingestion_spark.operators.text import (
            stupid_backoff_score)
        d = spark.createDataFrame(
            [(0, "a b c a b d"), (1, "a b c x b d q q")],
            "doc_id long, text string")
        out = stupid_backoff_score(d).collect()
        assert len(out) == 1
        r = out[0].asDict()
        # (a,b,c): c3=1/c2ctx=2 -> 500000; (x,b,d): bigram (b,d)=1,
        # c1ctx(b)=2 -> 2*1e6/10 = 200000; (c,x,b): unigram b=2, N=6
        # -> 8e6/150 = 53333 (half-up); three OOV-chain positions -> 0
        assert r["n_positions"] == 6
        assert (r["backoff_l3"], r["backoff_l2"],
                r["backoff_l1"], r["backoff_l0"]) == (1, 1, 1, 3)
        assert r["sb_ppm"] == 125556  # half-up of 753333/6

    def test_ref_stratum_excluded_and_alpha_chain_monotone(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.text import (
            stupid_backoff_score)
        d = spark.createDataFrame(
            [(0, "u v w u v w"), (100, "p q r"), (1, "u v w"), (2, "z v w")],
            "doc_id long, text string")
        out = {r["doc_id"]: r.asDict()
               for r in stupid_backoff_score(d).collect()}
        assert set(out) == {1, 2}           # refs 0 and 100 not scored
        # doc 1 hits the trigram level; doc 2 backs off on (z,v,w) ->
        # bigram (v,w): alpha discounts it below the direct trigram hit
        assert out[1]["backoff_l3"] == 1
        assert out[2]["backoff_l2"] == 1
        assert out[1]["sb_ppm"] > out[2]["sb_ppm"]
