"""Round-14 regressions: the GPT-2 pre-tokenizer (three-way parity of
the Java-regex engine, the DuckDB boundary-predicate replay, and an
independent Python simulation of the published pattern's alternation
semantics), its byte-level encode composition, and the persisted
near-dup shingle inventory's contracts (bit-equality with the direct
path, append-only maintenance, dial-mismatch detection)."""

from __future__ import annotations

import random
import unicodedata

import duckdb
import pytest

from pyspark.sql import functions as F


# ------------------------------------------------ GPT-2 pre-tokenizer

def gpt2_mirror(text: str) -> list[str]:
    """Independent simulation of the GPT-2 pre-tokenizer pattern
    (Radford et al. 2019; openai/gpt-2 encoder.py), written as a
    direct walk of the alternation semantics — leftmost-first, with
    the repo's two pinned dials (ASCII whitespace = Java \\s; unicode
    L/N categories) — NOT as a regex and NOT as the oracle's boundary
    predicate, so all three formulations are independent."""
    ws = set(" \t\n\x0b\f\r")

    def cat(ch: str) -> str:
        if ch in ws:
            return "W"
        c = unicodedata.category(ch)
        if c.startswith("L"):
            return "A"
        if c.startswith("N"):
            return "D"
        return "O"

    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        hit = next((c for c in ("'s", "'t", "'re", "'ve", "'m",
                                "'ll", "'d")
                    if text.startswith(c, i)), None)
        if hit:
            out.append(hit)
            i += len(hit)
            continue
        j = i
        if text[j] == " " and j + 1 < n and cat(text[j + 1]) != "W":
            j += 1  # ' ?' prefix: the run alternatives absorb it
        k = cat(text[j]) if j < n else "W"
        if text[i] != " " or j > i:
            if k != "W":
                e = j
                while e < n and cat(text[e]) == k:
                    e += 1
                out.append(text[i:e])
                i = e
                continue
        # whitespace alternatives: \s+(?!\S) then \s+
        e = i
        while e < n and cat(text[e]) == "W":
            e += 1
        if e == n or e - i == 1:
            out.append(text[i:e])  # (?!\S) holds, or single-char run
            i = e
        else:
            out.append(text[i:e - 1])  # donate the run's last char
            i = e - 1
    return out


EDGE_CASES = [
    "dog's,", "Hello  world", "a  b", "ab  ", "x2go", " 's", "\n's",
    "a''s", "'stop", "'rat", "'llama", "'rex", "abc'def", "!!'s!!",
    "a\t\tb", "DOG'S", "price: $12.50?!", "naïve café 北京", "a b",
    "i'm i've i'll i'd we're", "x'vey", "'r", "'", "''", "a'",
    "tab\ttab", "\r\n\r\nx", "   ", "a   b   c", "f(x)=3*g2",
    "it's a dog's life, isn't it?", " \t x", "§±3¾", "ß'sx",
]


def _duck_tokens(texts: list[str]) -> dict[int, list[str]]:
    from tf_prisma_api_data_ingestion_spark.catalog_oracles2 import (
        _SQL_GPT2_TOKENS_WITH)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (SELECT "
        "unnest(range(?)) AS doc_id, unnest(?) AS text)",
        [len(texts), texts])
    rows = con.execute(
        "WITH " + _SQL_GPT2_TOKENS_WITH
        + " SELECT doc_id, t FROM t").fetchall()
    got = {int(r[0]): list(r[1]) for r in rows}
    return {i: got.get(i, []) for i in range(len(texts))}


def _spark_tokens(spark, texts: list[str]) -> dict[int, list[str]]:
    from tf_prisma_api_data_ingestion_spark.operators.bpe import (
        gpt2_pieces)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    rows = df.select("doc_id",
                     gpt2_pieces(F.col("text")).alias("p")).collect()
    return {int(r["doc_id"]): list(r["p"]) for r in rows}


def _fuzz_texts(n: int = 300, seed: int = 14) -> list[str]:
    # alphabet tuned to collide with every carve-out: contraction
    # letters, apostrophes, mixed categories, multi-whitespace runs,
    # non-ASCII letters and symbols
    rng = random.Random(seed)
    alpha = list("'strevlmd ax2!.\t\n") + [" ", " ", "é", "北", "½", "§"]
    return ["".join(rng.choice(alpha)
                    for _ in range(rng.randrange(0, 24)))
            for _ in range(n)]


class TestGpt2PretokThreeWay:
    def test_edge_cases_three_way(self, spark):
        texts = EDGE_CASES
        mirror = {i: gpt2_mirror(t) for i, t in enumerate(texts)}
        assert _spark_tokens(spark, texts) == mirror
        assert _duck_tokens(texts) == mirror

    def test_fuzz_three_way(self, spark):
        texts = _fuzz_texts()
        mirror = {i: gpt2_mirror(t) for i, t in enumerate(texts)}
        assert _spark_tokens(spark, texts) == mirror
        assert _duck_tokens(texts) == mirror

    def test_pieces_partition_the_text(self):
        for t in EDGE_CASES + _fuzz_texts(100, seed=41):
            assert "".join(gpt2_mirror(t)) == t


class TestGpt2Encode:
    def test_leading_space_merge_applies(self, spark):
        # "a sip s" under gpt2 pretok -> pieces "a", " sip", " s";
        # byte v0 of " sip" = [20, 73, 69, 70, </w>]; merge ("20","73")
        # fuses the leading space with s: n_pieces = 4 + (" s": 2073,
        # 69, 70, </w>) ... per-piece: "a"->2, " sip"->4, " s"->2
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode)
        df = spark.createDataFrame([(1, "a sip s")],
                                   "doc_id long, text string")
        r = bpe_encode(df, [("20", "73")], basis="bytes",
                       pretok="gpt2").collect()[0]
        assert (r["n_words"], r["n_pieces"]) == (3, 8)

    def test_gpt2_vs_words_pretok_differ_on_punctuation(self, spark):
        # the whitespace pretok sees "dog's," as ONE word; gpt2 sees
        # three pieces — the segmentation difference the r13 verdict
        # named (n_words column records the pretok piece count)
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode)
        df = spark.createDataFrame([(1, "dog's,")],
                                   "doc_id long, text string")
        words = bpe_encode(df, [], basis="bytes").collect()[0]
        gpt2 = bpe_encode(df, [], basis="bytes",
                          pretok="gpt2").collect()[0]
        assert words["n_words"] == 1 and gpt2["n_words"] == 3
        # same bytes either way (+1 </w> per extra piece)
        assert gpt2["n_pieces"] == words["n_pieces"] + 2

    def test_oracle_matches_engine_on_crafted_corpus(self, spark):
        # the gate corpus has no apostrophes/case/punctuation; run the
        # full encode equivalence on a corpus that does
        from tf_prisma_api_data_ingestion_spark.catalog_oracles2 import (
            _sql_op_bpe_encode, _SQL_GPT2_TOKENS_WITH)
        from tf_prisma_api_data_ingestion_spark.operators.bpe import (
            bpe_encode)
        rows = [(i, t) for i, t in enumerate(EDGE_CASES) if t.strip()]
        merges = [("20", "73"), ("65", "72"), ("27", "73")]  # " s", er, 's
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(tuple(r) for r in bpe_encode(
            df, merges, basis="bytes", pretok="gpt2").collect())
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (SELECT "
            "unnest(?) AS doc_id, unnest(?) AS text)",
            [[r[0] for r in rows], [r[1] for r in rows]])
        sql = _sql_op_bpe_encode(
            merges,
            sym_split="regexp_extract_all(lower(hex(encode(word))),"
                      " '..')",
            tokens_with=_SQL_GPT2_TOKENS_WITH)
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want and len(got) > 0


# ------------------------- persisted MinHash-signature index (r14)

class TestLshInventory:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(10, "srcA", "a b c d e f g h"),
             (20, "srcB", "a b c d e f x y"),
             (1, "srcX", "a b c d e f g h"),
             (3, "srcX", "p q r s t u v w")],
            "doc_id long, source string, text string")

    def test_pairs_match_postings_path_and_hand_jaccard(self, spark,
                                                        tmp_path):
        # identical docs MUST band-collide (jaccard 1.0); every
        # returned pair must also appear in the exhaustive postings
        # path with the same 4-decimal jaccard (LSH output is a
        # verified SUBSET of the exact pair set)
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            incremental_jaccard_pairs,
            incremental_minhash_pairs_from_inventory, lsh_inventory)
        d = self._docs(spark)
        batch = d.filter(F.col("doc_id") >= 10)
        corpus = d.filter(F.col("doc_id") < 10)
        path = str(tmp_path / "lsh_inventory")
        lsh_inventory(corpus).write.parquet(path)
        got = {(r["new_id"], r["index_id"]): r["jaccard_r"]
               for r in incremental_minhash_pairs_from_inventory(
                   batch, spark.read.parquet(path)).collect()}
        assert got[(10, 1)] == 1.0
        exact = {(r["new_id"], r["index_id"]): r["jaccard_r"]
                 for r in incremental_jaccard_pairs(
                     batch, corpus, max_df=None).collect()}
        assert set(got) <= set(exact)
        assert all(exact[k] == v for k, v in got.items())

    def test_inventory_is_append_only(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            lsh_inventory)
        d = self._docs(spark)
        a, b = d.filter(F.col("doc_id") < 10), \
            d.filter(F.col("doc_id") >= 10)
        whole = sorted(map(repr, lsh_inventory(
            a.unionByName(b)).collect()))
        parts = sorted(map(repr, lsh_inventory(a).collect()
                           + lsh_inventory(b).collect()))
        assert whole == parts

    def test_dial_mismatch_raises_with_resolved_bands(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            incremental_minhash_pairs_from_inventory, lsh_inventory)
        d = self._docs(spark)
        inv = lsh_inventory(d, bands="auto")  # resolves to 32 @ 0.2
        with pytest.raises(ValueError, match="bands"):
            incremental_minhash_pairs_from_inventory(
                d, inv, bands=16).collect()
        # "auto" callers interoperate with int callers recording the
        # same resolved value
        assert incremental_minhash_pairs_from_inventory(
            d, inv, bands=32) is not None


# ------------------------------- streaming incremental near-dup (r14)

class TestStreamingNearDupMeter:
    def test_drained_stream_matches_batch_pairs(self, spark):
        # the meter must drain to bit-equality with the batch pair
        # pipeline on the same doc_id % 10 split — same pair set,
        # same 4-decimal jaccard
        from tf_prisma_api_data_ingestion_spark import tables
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            incremental_jaccard_pairs)
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            streaming_near_dup_meter)
        sf = "/root/testdata/sf0.001"
        got = sorted(tuple(r) for r in streaming_near_dup_meter(
            spark, sf, query_name="sin_t14").collect())
        d = tables.load(spark, sf, "documents")
        want = sorted(tuple(r) for r in incremental_jaccard_pairs(
            d.filter(F.col("doc_id") % 10 == 0),
            d.filter(F.col("doc_id") % 10 != 0)).collect())
        assert got == want and len(got) > 0

    def test_hand_case(self, spark, tmp_path):
        # batch doc 10 shares 4 of its 4 shingles with corpus doc 1
        # (jaccard 1.0) and 2 of 4 with corpus doc 3 (2/(4+4-2)=0.3333)
        import pyarrow as pa
        import pyarrow.parquet as pq
        from tf_prisma_api_data_ingestion_spark.streaming.windows import (
            streaming_near_dup_meter)
        rows = {
            "doc_id": [10, 1, 3],
            "source": ["srcA", "srcX", "srcX"],
            "text": ["a b c d e f", "a b c d e f", "a b c d x y"],
        }
        pq.write_table(pa.table(rows),
                       str(tmp_path / "documents.parquet"))
        got = {(r["new_id"], r["index_id"]): r["jaccard_r"]
               for r in streaming_near_dup_meter(
                   spark, str(tmp_path),
                   query_name="sin_t14b").collect()}
        assert got == {(10, 1): 1.0, (10, 3): 0.3333}


# ------------------------------------- persisted near-dup inventory

class TestShingleInventoryContracts:
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
            incremental_jaccard_pairs,
            incremental_jaccard_pairs_from_inventory,
            near_dup_provenance_incremental,
            near_dup_provenance_incremental_from_inventory,
            shingle_inventory)
        batch, corpus = self._frames(spark)
        path = str(tmp_path / "shingle_inventory")
        shingle_inventory(corpus).write.parquet(path)
        inv = spark.read.parquet(path)
        d_pairs = sorted(tuple(r) for r in incremental_jaccard_pairs(
            batch, corpus).collect())
        i_pairs = sorted(
            tuple(r) for r in incremental_jaccard_pairs_from_inventory(
                batch, inv).collect())
        assert i_pairs == d_pairs and len(d_pairs) > 0
        d_mat = sorted(
            tuple(r) for r in near_dup_provenance_incremental(
                batch, corpus).collect())
        i_mat = sorted(
            tuple(r)
            for r in near_dup_provenance_incremental_from_inventory(
                batch, inv).collect())
        assert i_mat == d_mat and len(d_mat) > 0

    def test_inventory_is_append_only(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            shingle_inventory)
        batch, corpus = self._frames(spark)
        whole = sorted(tuple(r) for r in shingle_inventory(
            corpus.unionByName(batch)).collect())
        parts = sorted(
            tuple(r) for r in shingle_inventory(corpus).collect()
        ) + sorted(tuple(r) for r in shingle_inventory(batch).collect())
        assert whole == sorted(parts)

    def test_shingle_n_mismatch_raises(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            incremental_jaccard_pairs_from_inventory, shingle_inventory)
        batch, corpus = self._frames(spark)
        inv = shingle_inventory(corpus, n=3)
        with pytest.raises(ValueError, match="shingle_n"):
            incremental_jaccard_pairs_from_inventory(
                batch, inv, n=4).collect()

    def test_passage_dial_mismatch_raises(self, spark):
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            passage_inventory,
            passage_provenance_incremental_from_inventory)
        batch, corpus = self._frames(spark)
        inv = passage_inventory(corpus, window=4, stride=2)
        with pytest.raises(ValueError, match="window"):
            passage_provenance_incremental_from_inventory(
                batch, inv, window=6, stride=2).collect()

    def test_inventory_pipeline_plan_is_batch_bounded(self, spark,
                                                      tmp_path):
        # the executed plan must (a) semi-join the inventory postings
        # to the broadcast batch keys (LeftSemi + BroadcastHashJoin),
        # and (b) never shuffle-join — a SortMergeJoin anywhere means
        # a corpus-sized side escaped the broadcast/semi structure
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            near_dup_provenance_incremental_from_inventory,
            shingle_inventory)
        batch, corpus = self._frames(spark)
        path = str(tmp_path / "inv_plan")
        shingle_inventory(corpus).write.parquet(path)
        inv = spark.read.parquet(path)
        df = near_dup_provenance_incremental_from_inventory(batch, inv)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "LeftSemi" in plan and "BroadcastHashJoin" in plan

    def test_pre_dial_inventory_accepted(self, spark):
        # an artifact written before the dial columns existed loads
        # under the documented caller-side contract
        from tf_prisma_api_data_ingestion_spark.operators.dedup import (
            near_dup_provenance_incremental,
            near_dup_provenance_incremental_from_inventory,
            shingle_inventory)
        batch, corpus = self._frames(spark)
        old = shingle_inventory(corpus).drop("shingle_n")
        got = sorted(
            tuple(r)
            for r in near_dup_provenance_incremental_from_inventory(
                batch, old).collect())
        want = sorted(
            tuple(r) for r in near_dup_provenance_incremental(
                batch, corpus).collect())
        assert got == want
