"""Round-12 regression suite for the r11 ADVICE items: the batched-
election concatenation-collision guard (bpe.bpe_elect_batch), the
Java-'.'-exact char split in the Arrow token meter
(streaming/windows._token_meter_arrow), the pinned NULL-word -> unk
behavior across tokenizer engines (subword fold twins), and the
pmod bit positions in bloom_prefilter_semi_join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators.bpe import (
    bpe_elect_batch)
from tf_prisma_api_data_ingestion_spark.operators.subword import (
    unigram_viterbi, wordpiece_segment)
from tf_prisma_api_data_ingestion_spark.operators.tokenizer_arrow import (
    JAVA_DOT_EXCLUDED, java_dot_chars)


def _counts_df(spark, rows):
    return spark.createDataFrame(
        rows, "left_sym string, right_sym string, pair_count long")


class TestElectBatchConcatCollision:
    def test_candidate_symbol_equal_to_kept_concat_rejected(self, spark):
        # ('a','b') kept; ('ab','c') shares NO symbol with it, yet
        # merging ('a','b') mints new 'ab' symbols that change
        # ('ab','c')'s count — the r11 ADVICE counterexample to the
        # plain-disjointness invariant. It must defer to a later round.
        pc = _counts_df(spark, [("a", "b", 100), ("ab", "c", 99),
                                ("d", "e", 98)])
        assert bpe_elect_batch(pc, 2) == [("a", "b", 100),
                                          ("d", "e", 98)]

    def test_candidate_concat_equal_to_kept_symbol_rejected(self, spark):
        # converse direction: kept ('ab','c') has symbol 'ab'; a later
        # candidate ('a','b') would MINT 'ab' symbols, feeding the
        # kept pair's count from the other side
        pc = _counts_df(spark, [("ab", "c", 100), ("a", "b", 99),
                                ("d", "e", 98)])
        assert bpe_elect_batch(pc, 2) == [("ab", "c", 100),
                                          ("d", "e", 98)]

    def test_collision_free_batch_unchanged(self, spark):
        # the guard must not disturb a genuinely independent batch
        pc = _counts_df(spark, [("a", "b", 10), ("c", "d", 9),
                                ("e", "f", 8)])
        assert bpe_elect_batch(pc, 3) == [("a", "b", 10), ("c", "d", 9),
                                          ("e", "f", 8)]


class TestTokenMeterLineTerminators:
    def test_java_dot_chars_drops_exactly_the_line_terminators(self):
        assert JAVA_DOT_EXCLUDED == frozenset(
            "\n\r  ")
        w = "ab c d\ne\rf"
        assert java_dot_chars(w) == list("abcdef")
        assert java_dot_chars("plain") == list("plain")

    def test_meter_engines_identical_on_line_terminator_text(self, spark):
        # U+0085 / U+2028 / U+2029 are NOT ASCII \s, so they survive
        # tokens() INSIDE a word; the fold's regexp_extract_all('.')
        # then drops them (Java '.' refuses line terminators) and the
        # Arrow kernel must drop them too (r11 ADVICE, medium) —
        # before the java_dot_chars fix, engine='arrow' counted the
        # terminator as an extra symbol
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            token_meter_projection)
        merges = [("t", "a"), ("ta", "b")]
        df = spark.createDataFrame(
            [("ta b plain",), ("xy z",),
             ("  lead",), (None,)], "text string")
        fold = df.select(token_meter_projection(
            F.col("text"), merges, engine="fold").alias("m"))
        arrow = df.select(token_meter_projection(
            F.col("text"), merges, engine="arrow").alias("m"))
        key = lambda r: (r["m"]["n_words"], r["m"]["n_pieces"])
        got_f = sorted(map(key, fold.collect()))
        got_a = sorted(map(key, arrow.collect()))
        assert got_f == got_a
        # and the fold semantics are the intended ones: 'ta<U+2028>b'
        # metering exactly like 'tab' (t a b -> ta b -> tab + </w> = 2)
        # limit(1) does not guarantee WHICH row survives (r12 ADVICE:
        # the old form leaned on incidental single-partition ordering)
        # — build the U+2028 document as its own one-row frame
        one = spark.createDataFrame(
            [("ta b plain",)], "text string"
        ).select(token_meter_projection(
            F.col("text"), merges, engine="fold").alias("m")).head()["m"]
        assert (one["n_words"], one["n_pieces"]) == (2, 2 + 6)


class TestNullWordEngineParity:
    WORDS = "wid long, word string"

    def _df(self, spark):
        return spark.createDataFrame(
            [(1, None), (2, "table"), (3, "")], self.WORDS)

    def test_unigram_null_word_is_unk_in_both_engines(self, spark):
        from tf_prisma_api_data_ingestion_spark.catalog_registry import (
            UNIGRAM_DEMO_PIECES)
        d = self._df(spark)
        for eng in ("fold", "arrow"):
            got = {r["wid"]: r for r in unigram_viterbi(
                d, UNIGRAM_DEMO_PIECES, max_word_len=12,
                engine=eng).collect()}
            assert got[1]["pieces"] == ["<unk>"], eng
            assert got[1]["n_pieces"] == 1, eng
            assert got[1]["score_micro"] == -100_000_000, eng
            assert got[3]["pieces"] == ["<unk>"], eng
            assert got[2]["pieces"] is not None and \
                got[2]["pieces"] != ["<unk>"], eng

    def test_wordpiece_null_word_is_unk_in_both_engines(self, spark):
        from tf_prisma_api_data_ingestion_spark.catalog_registry import (
            WORDPIECE_DEMO_VOCAB)
        d = self._df(spark)
        for eng in ("fold", "arrow"):
            got = {r["wid"]: r for r in wordpiece_segment(
                d, WORDPIECE_DEMO_VOCAB, max_word_len=12,
                engine=eng).collect()}
            assert got[1]["pieces"] == ["[UNK]"], eng
            assert got[1]["n_pieces"] == 1, eng
            assert got[1]["is_unk"] is True, eng
            assert got[3]["is_unk"] is True, eng


class TestPassageProvenance:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "srcA", "a b c d e f"),
             (2, "srcB", "a b c d x y"),
             (3, "srcA", "a b c d e f")],
            "doc_id long, source string, text string")

    def test_hand_case_matrix(self, spark):
        # window=4 stride=2: d1/d3 share [a b c d] and [c d e f];
        # d2 shares [a b c d] with both; [c d x y] is single-doc
        # (dropped). Expected: within-srcA 2 shared hashes, 1 doc
        # pair each; cross A-B 1 shared hash, 2 doc pairs (d1-d2,
        # d3-d2); no B-B row (nd=1).
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance)
        got = sorted(tuple(r) for r in passage_provenance(
            self._df(spark), window=4, stride=2).collect())
        assert got == [("srcA", "srcA", 2, 2), ("srcA", "srcB", 1, 2)]

    def test_hot_passage_cap_drops_boilerplate(self, spark):
        # max_docs_per_hash=2 drops the 3-doc hash [a b c d]; only
        # the within-srcA [c d e f] evidence survives
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance)
        got = sorted(tuple(r) for r in passage_provenance(
            self._df(spark), window=4, stride=2,
            max_docs_per_hash=2).collect())
        assert got == [("srcA", "srcA", 1, 1)]

    def test_short_docs_yield_empty(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance)
        d = spark.createDataFrame([(1, "s", "too short")],
                                  "doc_id long, source string, text string")
        assert passage_provenance(d).count() == 0


class TestNearDupProvenance:
    def test_matches_manual_pair_rollup_on_corpus(self, spark):
        # the operator must equal rolling up minhash_lsh_pairs_md5's
        # verified pairs by source by hand — same pipeline, same ppm
        # integerization
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            minhash_lsh_pairs_md5, near_dup_provenance)
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = sorted(tuple(r) for r in near_dup_provenance(d).collect())
        pairs = minhash_lsh_pairs_md5(d)
        src = d.select("doc_id", "source")
        a = src.select(F.col("doc_id").alias("doc_a"),
                       F.col("source").alias("_sa"))
        b = src.select(F.col("doc_id").alias("doc_b"),
                       F.col("source").alias("_sb"))
        man = (pairs.join(a, "doc_a").join(b, "doc_b")
               .select(F.least("_sa", "_sb").alias("sa"),
                       F.greatest("_sa", "_sb").alias("sb"),
                       F.round(F.col("jaccard_r") * 1_000_000)
                        .cast("long").alias("ppm")))
        want = sorted(
            (r["sa"], r["sb"], r["n"], r["s"]) for r in
            man.groupBy("sa", "sb")
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("ppm").cast("long").alias("s")).collect())
        assert got == want
        assert len(got) > 0  # the gate corpus has near-dup evidence

    def test_cross_source_hand_case(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            near_dup_provenance)
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the quiet green forest tonight")
        d = spark.createDataFrame(
            [(1, "srcA", base),
             (2, "srcB", base.replace("quiet", "dark")),
             (3, "srcC", "completely unrelated text about spark "
                         "query plans and shuffle partitions here")],
            "doc_id long, source string, text string")
        got = {(r["source_a"], r["source_b"]): r["dup_pairs"]
               for r in near_dup_provenance(d).collect()}
        assert got == {("srcA", "srcB"): 1}


class TestBloomPmodPositions:
    def test_semi_join_still_exact_after_pmod(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.relational \
            import bloom_prefilter_semi_join
        big = spark.range(0, 2000).select(
            (F.col("id") % 97).cast("string").alias("k"), "id")
        small = spark.createDataFrame(
            [(str(v),) for v in (3, 17, 42)], "k string")
        got = bloom_prefilter_semi_join(big, small, "k", "k",
                                        m_bits=1 << 10, k=3)
        want = big.join(small, "k", "left_semi")
        assert sorted(r["id"] for r in got.collect()) == \
            sorted(r["id"] for r in want.collect())
