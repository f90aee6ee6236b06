"""Round-13 regressions: the oracle half of the line-terminator seam
(r12 ADVICE), the passage_provenance single-tokenize plan, and the
tokenizer artifact round-trip."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


# --------------------------------------------- oracle '.'-seam, 3-way
#
# r11 closed the ENGINE half of the line-terminator seam (the Arrow
# kernel matches the fold's Java '.' semantics via java_dot_chars);
# r12 ADVICE observed the ORACLE half was still open: DuckDB's RE2
# '.' excludes only \n, so on a word containing U+0085/U+2028/U+2029
# both Spark engines would diverge from a bare-'.' oracle TOGETHER.
# catalog_oracles2._RE2_JAVA_DOT now pins the oracle to Java
# semantics; this corpus makes the seam load-bearing (the gate corpus
# has no such words).

_SEAM_ROWS = [
    # U+2028 inside a word: Java '.' drops it, so 'ta b' must
    # segment exactly like 'tab' in every engine AND the oracle
    (1, "ta b plain"),
    # U+0085 and U+2029 inside words; plus a plain twin of doc 1
    (2, "xy ta b"),
    (3, "tab plain"),
    # leading/trailing terminators and an empty-after-split doc
    (4, " ta b"),
]
_SEAM_MERGES = [("t", "a"), ("ta", "b")]


class TestBpeOracleLineTerminatorSeam:
    def _oracle(self):
        from tf_prisma_api_data_ingestion_spark.catalog_oracles2 import (
            _sql_op_bpe_encode)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{t.replace(chr(39), chr(39) * 2)}')"
                for i, t in _SEAM_ROWS)
            + ") AS t(doc_id, text)")
        rows = con.execute(_sql_op_bpe_encode(_SEAM_MERGES)).fetchall()
        return sorted(tuple(r) for r in rows)

    def _spark(self, spark, engine):
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode)
        df = spark.createDataFrame(_SEAM_ROWS, "doc_id long, text string")
        return sorted(
            tuple(r) for r in bpe_encode(
                df, _SEAM_MERGES, engine=engine).collect())

    def test_three_way_identity_on_line_terminator_words(self, spark):
        oracle = self._oracle()
        fold = self._spark(spark, "fold")
        arrow = self._spark(spark, "arrow")
        assert fold == arrow
        assert fold == oracle

    def test_u2028_word_meters_like_its_plain_twin(self, spark):
        # doc 1 ('ta<U+2028>b plain') and doc 3 ('tab plain') must be
        # indistinguishable to the encoder: t a b -> ta b -> tab,
        # i.e. 2 words, (1 + 2) + </w>-counted pieces identical
        fold = {r[0]: r[1:] for r in (
            tuple(x) for x in self._spark(spark, "fold"))}
        assert fold[1] == fold[3]

    def test_oracle_class_is_java_dot(self):
        # the RE2 class must exclude exactly Java '.'-refused chars
        from tf_prisma_api_data_ingestion_spark.catalog_oracles2 import (
            _RE2_JAVA_DOT)
        con = duckdb.connect()
        got = con.execute(
            "SELECT regexp_extract_all('a' || chr(10) || chr(13) || "
            "chr(133) || chr(8232) || chr(8233) || 'b', "
            f"'{_RE2_JAVA_DOT}')").fetchone()[0]
        assert got == ["a", "b"]


# ------------------------------------- provenance single-tokenize plan

class TestPassageProvenancePlan:
    def test_single_tokenize_in_executed_plan(self, spark):
        # r12 VERDICT: the old pre-filter re-evaluated tokens() over
        # the whole corpus (Filter and Project don't share
        # subexpressions across nodes). The executed plan must now
        # carry exactly ONE regexp split of the text column on the
        # corpus-sized stage.
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance)
        df = spark.createDataFrame(
            [(1, "srcA", "a b c d e f"), (2, "srcB", "a b c d x y"),
             (3, "srcA", "a b c d e f"), (4, "srcB", "q")],
            "doc_id long, source string, text string")
        out = passage_provenance(df, window=4, stride=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the tokenize appears once (inside passage_hashes' Generate);
        # the dropped Filter twin would add a second occurrence
        assert plan.count("split(") <= 1, plan

    def test_matrix_unchanged_without_prefilter(self, spark):
        # same hand case as test_round12's TestPassageProvenance plus
        # a short doc that the internal guard must drop
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance)
        df = spark.createDataFrame(
            [(1, "srcA", "a b c d e f"), (2, "srcB", "a b c d x y"),
             (3, "srcA", "a b c d e f"), (4, "srcB", "q")],
            "doc_id long, source string, text string")
        got = {(r["source_a"], r["source_b"]):
               (r["n_shared_passages"], r["dup_doc_pairs"])
               for r in passage_provenance(
                   df, window=4, stride=2).collect()}
        assert got == {("srcA", "srcA"): (2, 2),
                       ("srcA", "srcB"): (1, 2)}


# ------------------------------------- incremental provenance (r13)

class TestPassageProvenanceIncremental:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [(1, "srcX", "a b c d e f"), (2, "srcY", "a b c d x y"),
             (3, "srcX", "a b c d e f")],
            "doc_id long, source string, text string")
        batch = spark.createDataFrame(
            [(11, "srcA", "a b c d q r"), (12, "srcB", "c d e f s t"),
             (13, "srcB", "q")],
            "doc_id long, source string, text string")
        return batch, corpus

    def _run(self, spark, **kw):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance_incremental)
        batch, corpus = self._frames(spark)
        return {(r["batch_source"], r["corpus_source"]):
                (r["n_shared_passages"], r["dup_doc_pairs"])
                for r in passage_provenance_incremental(
                    batch, corpus, window=4, stride=2, **kw).collect()}

    def test_hand_case_matrix(self, spark):
        # [a b c d] hits batch{11:srcA} x corpus{1,3:srcX; 2:srcY};
        # [c d e f] hits batch{12:srcB} x corpus{1,3:srcX};
        # doc 13 is shorter than the window (internal guard drops it)
        assert self._run(spark) == {("srcA", "srcX"): (1, 2),
                                    ("srcA", "srcY"): (1, 1),
                                    ("srcB", "srcX"): (1, 2)}

    def test_hot_passage_cap_is_corpus_side(self, spark):
        # cap=2: [a b c d] has 3 distinct CORPUS docs -> dropped;
        # [c d e f] has 2 -> kept
        assert self._run(spark, max_docs_per_hash=2) == {
            ("srcB", "srcX"): (1, 2)}

    def test_empty_batch_and_empty_corpus(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance_incremental)
        batch, corpus = self._frames(spark)
        empty = batch.limit(0)
        assert passage_provenance_incremental(
            empty, corpus, window=4, stride=2).count() == 0
        assert passage_provenance_incremental(
            batch, corpus.limit(0), window=4, stride=2).count() == 0

    def test_no_corpus_self_join_and_batch_side_broadcast(
            self, spark, monkeypatch):
        # the checkpoint barrier hides the corpus stage from the final
        # frame's plan (it executes at materialization, the
        # dedup-provenance idiom) — disable it to assert the SHAPE:
        # the corpus hit stream is reduced by a broadcast LeftSemi
        # against the batch-hash set before any aggregation, and no
        # frame self-joins
        # pyspark 4 splits classic/connect: the runtime object is the
        # classic subclass, whose OWN localCheckpoint shadows the base
        try:
            from pyspark.sql.classic.dataframe import (
                DataFrame as SparkDF)
        except ImportError:  # pragma: no cover - pyspark < 4
            from pyspark.sql import DataFrame as SparkDF
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance_incremental)
        monkeypatch.setattr(SparkDF, "localCheckpoint",
                            lambda self, eager=True: self)
        batch, corpus = self._frames(spark)
        out = passage_provenance_incremental(batch, corpus,
                                             window=4, stride=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan, plan
        assert "BroadcastExchange" in plan, plan
        # values identical with the barrier disabled
        got = {(r["batch_source"], r["corpus_source"]):
               (r["n_shared_passages"], r["dup_doc_pairs"])
               for r in out.collect()}
        assert got == {("srcA", "srcX"): (1, 2),
                       ("srcA", "srcY"): (1, 1),
                       ("srcB", "srcX"): (1, 2)}


# ---------------------------------- tokenizer artifact round-trip (r13)

class TestTokenizerArtifactRoundTrip:
    _CORPUS = [(1, "the cat sat on the mat"), (2, "the bat sat"),
               (3, "cats chatter the chat"), (4, "mat bat cat")]

    def _docs(self, spark):
        return spark.createDataFrame(self._CORPUS,
                                     "doc_id long, text string")

    def test_bpe_merge_table_round_trip(self, spark, tmp_path):
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode, bpe_train)
        from tf_prisma_api_data_ingestion_spark.operators.tokenizer_io \
            import load_bpe_merges, save_bpe_merges
        docs = self._docs(spark)
        trained = bpe_train(docs, n_merges=4)
        in_session = [(r["left_sym"], r["right_sym"])
                      for r in trained.orderBy("merge_rank").collect()]
        path = str(tmp_path / "bpe_merges")
        save_bpe_merges(trained, path)
        reloaded = load_bpe_merges(spark, path)
        assert reloaded == in_session
        # encode over the RELOADED table bit-matches the in-session
        # encode, on BOTH engines
        want = sorted(tuple(r) for r in
                      bpe_encode(docs, in_session).collect())
        for eng in ("fold", "arrow"):
            got = sorted(tuple(r) for r in
                         bpe_encode(docs, reloaded, engine=eng).collect())
            assert got == want, eng

    def test_unigram_piece_table_round_trip(self, spark, tmp_path):
        from tf_prisma_api_data_ingestion_spark.catalog_registry import (
            UNIGRAM_DEMO_PIECES)
        from tf_prisma_api_data_ingestion_spark.operators.subword import (
            unigram_em_train, unigram_viterbi)
        from tf_prisma_api_data_ingestion_spark.operators.tokenizer_io \
            import load_unigram_pieces, save_unigram_pieces
        docs = self._docs(spark)
        trained = unigram_em_train(docs, UNIGRAM_DEMO_PIECES,
                                   n_rounds=1, max_word_len=12)
        path = str(tmp_path / "unigram_pieces")
        save_unigram_pieces(spark, trained, path)
        reloaded = load_unigram_pieces(spark, path)
        assert reloaded == [(p, int(s)) for p, s in trained]
        words = spark.createDataFrame(
            [("chatter",), ("mat",), ("zzz",)], "word string")
        want = sorted(
            (r["word"], tuple(r["pieces"]), r["score_micro"])
            for r in unigram_viterbi(words, trained,
                                     max_word_len=12).collect())
        for eng in ("fold", "arrow"):
            got = sorted(
                (r["word"], tuple(r["pieces"]), r["score_micro"])
                for r in unigram_viterbi(words, reloaded,
                                         max_word_len=12,
                                         engine=eng).collect())
            assert got == want, eng

    def test_wordpiece_vocab_round_trip(self, spark, tmp_path):
        from tf_prisma_api_data_ingestion_spark.catalog_registry import (
            WORDPIECE_DEMO_VOCAB)
        from tf_prisma_api_data_ingestion_spark.operators.subword import (
            wordpiece_segment)
        from tf_prisma_api_data_ingestion_spark.operators.tokenizer_io \
            import load_wordpiece_vocab, save_wordpiece_vocab
        path = str(tmp_path / "wp_vocab")
        save_wordpiece_vocab(spark, WORDPIECE_DEMO_VOCAB, path)
        reloaded = load_wordpiece_vocab(spark, path)
        assert reloaded == list(WORDPIECE_DEMO_VOCAB)
        words = spark.createDataFrame(
            [("chatter",), ("mat",), ("zzz",)], "word string")
        want = sorted(
            (r["word"], tuple(r["pieces"]), r["is_unk"])
            for r in wordpiece_segment(
                words, WORDPIECE_DEMO_VOCAB, max_word_len=12).collect())
        for eng in ("fold", "arrow"):
            got = sorted(
                (r["word"], tuple(r["pieces"]), r["is_unk"])
                for r in wordpiece_segment(
                    words, reloaded, max_word_len=12,
                    engine=eng).collect())
            assert got == want, eng


# ------------------------------ incremental NEAR provenance (r13)

class TestNearDupProvenanceIncremental:
    def test_hand_case_no_within_side_pairs(self, spark):
        # b1/b2 are identical batch docs (their pair must NOT appear:
        # batch never self-joins); c1/c3 are identical corpus docs
        # (ditto for the index side). Each batch doc vs each of c1/c3:
        # 7-token texts -> 5 trigrams, 4 shared, union 6 ->
        # jaccard 0.6667 -> 666700 ppm per pair.
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            near_dup_provenance_incremental)
        batch = spark.createDataFrame(
            [(11, "srcA", "the cat sat on the mat today"),
             (12, "srcB", "the cat sat on the mat today")],
            "doc_id long, source string, text string")
        corpus = spark.createDataFrame(
            [(1, "srcX", "the cat sat on the mat tonight"),
             (2, "srcY", "completely different text entirely here now"),
             (3, "srcX", "the cat sat on the mat tonight")],
            "doc_id long, source string, text string")
        got = {(r["batch_source"], r["corpus_source"]):
               (r["dup_pairs"], r["jaccard_ppm_sum"])
               for r in near_dup_provenance_incremental(
                   batch, corpus, n=3, threshold=0.2).collect()}
        assert got == {("srcA", "srcX"): (2, 1333400),
                       ("srcB", "srcX"): (2, 1333400)}

    def test_empty_batch(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            near_dup_provenance_incremental)
        corpus = spark.createDataFrame(
            [(1, "srcX", "the cat sat on the mat tonight")],
            "doc_id long, source string, text string")
        assert near_dup_provenance_incremental(
            corpus.limit(0), corpus).count() == 0


# --------------------------------- composed provenance report (r13)

class TestProvenanceReport:
    def test_composition_matches_parents_with_zero_fill(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            near_dup_provenance, passage_provenance, provenance_report)
        from tf_prisma_api_data_ingestion_spark import tables
        docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
        exact = {(r["source_a"], r["source_b"]):
                 (r["n_shared_passages"], r["dup_doc_pairs"])
                 for r in passage_provenance(docs).collect()}
        near = {(r["source_a"], r["source_b"]):
                (r["dup_pairs"], r["jaccard_ppm_sum"])
                for r in near_dup_provenance(docs).collect()}
        got = {(r["source_a"], r["source_b"]):
               (r["n_shared_passages"], r["dup_doc_pairs"],
                r["near_dup_pairs"], r["jaccard_ppm_sum"])
               for r in provenance_report(docs).collect()}
        assert set(got) == set(exact) | set(near)
        for k, (nsp, ddp, ndp, ppm) in got.items():
            assert (nsp, ddp) == exact.get(k, (0, 0)), k
            assert (ndp, ppm) == near.get(k, (0, 0)), k
        # the composition is non-trivial on the gate corpus: at least
        # one cell exists in only one granularity (zero-fill is live)
        assert set(exact) != set(near)


# ----------------------------- persisted passage inventory (r13)

class TestPassageInventory:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [(1, "srcX", "a b c d e f"), (2, "srcY", "a b c d x y"),
             (3, "srcX", "a b c d e f")],
            "doc_id long, source string, text string")
        batch = spark.createDataFrame(
            [(11, "srcA", "a b c d q r"), (12, "srcB", "c d e f s t")],
            "doc_id long, source string, text string")
        return batch, corpus

    def test_inventory_path_bit_matches_direct(self, spark, tmp_path):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_inventory, passage_provenance_incremental,
            passage_provenance_incremental_from_inventory)
        batch, corpus = self._frames(spark)
        path = str(tmp_path / "inventory")
        passage_inventory(corpus, window=4, stride=2) \
            .write.parquet(path)
        inv = spark.read.parquet(path)
        direct = sorted(tuple(r) for r in passage_provenance_incremental(
            batch, corpus, window=4, stride=2).collect())
        via = sorted(tuple(r) for r in
                     passage_provenance_incremental_from_inventory(
                         batch, inv, window=4, stride=2).collect())
        assert via == direct and len(direct) > 0

    def test_inventory_is_append_only(self, spark):
        # inventory(A union B) row set == inventory(A) + inventory(B)
        # for disjoint doc sets — accepting a batch IS an append
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_inventory)
        batch, corpus = self._frames(spark)
        whole = sorted(tuple(r) for r in passage_inventory(
            corpus.unionByName(batch), window=4, stride=2).collect())
        parts = sorted(
            tuple(r) for r in passage_inventory(
                corpus, window=4, stride=2).collect()) + sorted(
            tuple(r) for r in passage_inventory(
                batch, window=4, stride=2).collect())
        assert whole == sorted(parts)


# ------------------------------- streaming provenance meter (r13)

class TestStreamingProvenanceMeter:
    def test_drained_stream_matches_batch_matrix(self, spark):
        # dup_doc_pairs is algebraically passage_provenance_incremental's
        # column (sum of nd_b * nd_c per shared hash), so the drained
        # stream must bit-match the batch matrix on it, cell for cell
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance_incremental)
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            streaming_provenance_meter)
        from tf_prisma_api_data_ingestion_spark import tables
        sf = "/root/testdata/sf0.001"
        got = {(r["batch_source"], r["corpus_source"]): r["dup_doc_pairs"]
               for r in streaming_provenance_meter(
                   spark, sf, query_name="spv_t13").collect()}
        d = tables.load(spark, sf, "documents")
        want = {(r["batch_source"], r["corpus_source"]): r["dup_doc_pairs"]
                for r in passage_provenance_incremental(
                    d.filter(F.col("doc_id") % 10 == 0),
                    d.filter(F.col("doc_id") % 10 != 0)).collect()}
        assert got == want and len(got) > 0

    def test_hit_doc_passages_counts_incidences(self, spark, tmp_path):
        # two batch docs sharing one passage with two corpus docs of
        # one source: hit_doc_passages = 2 (one per batch doc),
        # dup_doc_pairs = 2 * nd_c = 4
        import pyarrow as pa
        import pyarrow.parquet as pq
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            streaming_provenance_meter)
        rows = {
            "doc_id": [10, 20, 1, 3],
            "source": ["srcA", "srcA", "srcX", "srcX"],
            "text": ["a b c d q r", "a b c d s t",
                     "a b c d e f", "a b c d e f"],
        }
        pq.write_table(pa.table(rows),
                       str(tmp_path / "documents.parquet"))
        got = {(r["batch_source"], r["corpus_source"]):
               (r["hit_doc_passages"], r["dup_doc_pairs"])
               for r in streaming_provenance_meter(
                   spark, str(tmp_path), window=4, stride=2,
                   query_name="spv_t13b").collect()}
        assert got == {("srcA", "srcX"): (2, 4)}


# --------------------------- daily-ingest e2e (inventory maintenance)

class TestDailyIngestE2E:
    def test_accept_appends_inventory_and_recrawl_is_caught(
            self, spark, tmp_path):
        """The production ingest loop end-to-end with real parquet IO:
        (1) the accepted corpus's passage inventory is persisted;
        (2) a landing batch is provenance-checked against it WITHOUT
        re-tokenizing the corpus; (3) accepting the batch = appending
        the batch's own inventory rows (append-only contract);
        (4) a re-crawl of the just-accepted batch, checked against the
        UPDATED inventory, is caught as duplication of the batch's own
        source — the growing-corpus behavior the artifact exists for."""
        from pyspark.sql import functions as F
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_inventory,
            passage_provenance_incremental_from_inventory)
        from tf_prisma_api_data_ingestion_spark import tables

        sf = "/root/testdata/sf0.001"
        d = tables.load(spark, sf, "documents")
        corpus = d.filter(F.col("doc_id") % 10 != 0)
        batch = d.filter(F.col("doc_id") % 10 == 0)
        inv_path = str(tmp_path / "inventory")

        # (1) accept-time artifact for the existing corpus
        passage_inventory(corpus).write.parquet(inv_path)

        # (2) provenance-check the landing batch against the artifact
        inv = spark.read.parquet(inv_path)
        before = {(r["batch_source"], r["corpus_source"]): r
                  for r in passage_provenance_incremental_from_inventory(
                      batch, inv).collect()}
        assert len(before) > 0  # the gate corpus shares passages

        # (3) accept: append ONLY the batch's own inventory rows
        passage_inventory(batch).write.mode("append").parquet(inv_path)

        # (4) a re-crawl of the accepted batch (new doc ids, same text)
        recrawl = batch.withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000))
        inv2 = spark.read.parquet(inv_path)
        after = {(r["batch_source"], r["corpus_source"]):
                 (r["n_shared_passages"], r["dup_doc_pairs"])
                 for r in passage_provenance_incremental_from_inventory(
                     recrawl, inv2).collect()}
        batch_sources = {r["source"] for r in
                         batch.select("source").distinct().collect()}
        # every batch source with >= 1 multi-passage doc must now be
        # flagged against ITSELF (its docs are in the corpus artifact)
        self_cells = {k for k in after if k[0] == k[1]
                      and k[0] in batch_sources}
        assert self_cells, after
        # and the pre-accept matrix is a subset story: old cells only
        # grow (the corpus gained docs, never lost them)
        for k, r in before.items():
            assert k in after, k
            assert after[k][0] >= r["n_shared_passages"], k
            assert after[k][1] >= r["dup_doc_pairs"], k


# ------------------- property: incremental matrix vs python mirror

import hashlib as _hashlib

from hypothesis import given, settings, strategies as st


def _py_passages(text, window, stride):
    """Pure-python mirror of text.passage_hashes: md5 of each
    window-token slice every stride tokens; short docs yield none."""
    import re as _re
    toks = [t for t in _re.split(r"\s+", text.strip().lower()) if t]
    if len(toks) < window:
        return set()
    return {
        _hashlib.md5(
            " ".join(toks[i:i + window]).encode()).hexdigest()
        for i in range(0, len(toks) - window + 1, stride)}


def _py_incremental_matrix(batch, corpus, window, stride, cap):
    """Brute-force mirror of passage_provenance_incremental."""
    from collections import defaultdict
    bw = defaultdict(set)   # hash -> set of (doc, src) on batch side
    cw = defaultdict(set)
    for did, src, text in batch:
        for h in _py_passages(text, window, stride):
            bw[h].add((did, src))
    for did, src, text in corpus:
        for h in _py_passages(text, window, stride):
            cw[h].add((did, src))
    out = defaultdict(lambda: [0, 0])
    for h, bds in bw.items():
        cds = cw.get(h)
        if not cds or len({d for d, _ in cds}) > cap:
            continue
        nb, nc = defaultdict(int), defaultdict(int)
        for _, s in bds:
            nb[s] += 1
        for _, s in cds:
            nc[s] += 1
        for sb, b in nb.items():
            for sc, c in nc.items():
                cell = out[(sb, sc)]
                cell[0] += 1
                cell[1] += b * c
    return {k: tuple(v) for k, v in out.items()}


@st.composite
def _prov_case(draw):
    vocab = ["aa", "bb", "cc", "dd"]
    def doc(i):
        n = draw(st.integers(min_value=0, max_value=10))
        words = draw(st.lists(st.sampled_from(vocab),
                              min_size=n, max_size=n))
        src = draw(st.sampled_from(["s1", "s2", "s3"]))
        return (i, src, " ".join(words))
    nb = draw(st.integers(min_value=0, max_value=4))
    nc = draw(st.integers(min_value=1, max_value=6))
    batch = [doc(i) for i in range(nb)]
    corpus = [doc(100 + i) for i in range(nc)]
    return batch, corpus


class TestIncrementalProvenanceProperty:
    @settings(max_examples=8, deadline=None)
    @given(_prov_case())
    def test_matches_python_brute_force(self, spark, case):
        # tiny vocab + stride 1 windows make hash collisions of
        # MEANING (same window text in many docs) common, exercising
        # the count-product accounting; cap=2 exercises the
        # corpus-side hot-passage drop
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_provenance_incremental)
        batch, corpus = case
        schema = "doc_id long, source string, text string"
        bdf = spark.createDataFrame(batch, schema) if batch else \
            spark.createDataFrame([], schema)
        cdf = spark.createDataFrame(corpus, schema)
        got = {(r["batch_source"], r["corpus_source"]):
               (r["n_shared_passages"], r["dup_doc_pairs"])
               for r in passage_provenance_incremental(
                   bdf, cdf, window=3, stride=1,
                   max_docs_per_hash=2).collect()}
        want = _py_incremental_matrix(batch, corpus, 3, 1, 2)
        assert got == want


# ---------------------------------- byte-level (GPT-2 basis) BPE

class TestByteLevelBpe:
    def test_ascii_corpus_is_isomorphic_to_char_basis(self, spark):
        # on pure-ASCII text, byte basis == char basis under the
        # char->hex-pair symbol mapping: same n_pieces per doc
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode)
        df = spark.createDataFrame(
            [(1, "table tab ta"), (2, "stable hat")],
            "doc_id long, text string")
        char_merges = [("t", "a"), ("ta", "b"), ("tab", "l")]
        as_hex = lambda s: s if s == "</w>" else s.encode().hex()
        byte_merges = [(as_hex(a), as_hex(b)) for a, b in char_merges]
        want = sorted(
            (r["doc_id"], r["n_words"], r["n_pieces"]) for r in
            bpe_encode(df, char_merges, basis="chars").collect())
        got = sorted(
            (r["doc_id"], r["n_words"], r["n_pieces"]) for r in
            bpe_encode(df, byte_merges, basis="bytes").collect())
        assert got == want

    def test_multibyte_chars_split_into_bytes(self, spark):
        # 'café' is 4 chars but 5 UTF-8 bytes (é = c3 a9): with no
        # merges, byte basis counts one more symbol than char basis
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_init_vocab)
        df = spark.createDataFrame([(1, "café")],
                                   "doc_id long, text string")
        chars = bpe_init_vocab(df, basis="chars").head()
        bts = bpe_init_vocab(df, basis="bytes").head()
        assert len(chars["syms"]) == 4 + 1  # + </w>
        assert bts["syms"] == ["63", "61", "66", "c3", "a9", "</w>"]
        # and a merge can reassemble the multi-byte char from bytes
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_apply_merges)
        out = bpe_apply_merges(
            bpe_init_vocab(df, basis="bytes"), [("c3", "a9")],
            engine="fold").head()
        assert out["syms"] == ["63", "61", "66", "c3a9", "</w>"]

    def test_engines_identical_on_byte_basis(self, spark):
        from tf_prisma_api_data_ingestion_spark.catalog_registry import (
            BPE_BYTES_DEMO_MERGES)
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode)
        from tf_prisma_api_data_ingestion_spark import tables
        docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
        want = sorted(tuple(r) for r in bpe_encode(
            docs, BPE_BYTES_DEMO_MERGES, basis="bytes",
            engine="fold").collect())
        got = sorted(tuple(r) for r in bpe_encode(
            docs, BPE_BYTES_DEMO_MERGES, basis="bytes",
            engine="arrow").collect())
        assert got == want

    def test_byte_training_learns_the_pinned_demo_table(self, spark):
        # BPE_BYTES_DEMO_MERGES is a TRAINED artifact (sf0.01); the
        # first 3 byte merges on sf0.001 must at least be valid hex
        # pairs / grown symbols and deterministic across two runs
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_train)
        from tf_prisma_api_data_ingestion_spark import tables
        docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
        a = [(r["left_sym"], r["right_sym"]) for r in
             bpe_train(docs, n_merges=3, basis="bytes")
             .orderBy("merge_rank").collect()]
        b = [(r["left_sym"], r["right_sym"]) for r in
             bpe_train(docs, n_merges=3, basis="bytes")
             .orderBy("merge_rank").collect()]
        assert a == b and len(a) == 3
        hexish = set("0123456789abcdef")
        for l, r in a:
            for s in (l, r):
                assert s == "</w>" or set(s) <= hexish, (l, r)

    def test_unknown_basis_raises(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            word_syms)
        import pytest as _pytest
        from pyspark.sql import functions as F
        with _pytest.raises(ValueError, match="unknown basis"):
            word_syms(F.lit("x"), basis="nibbles")
