"""Corpus datasheet plan (catalog_registry.q_plan_corpus_datasheet):
per-(source, lang) release report invariants plus hand-built cases
for the cross-source duplicate accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.catalog_registry import (
    q_plan_corpus_datasheet)

SF = "/root/testdata/sf0.001"


class TestDatasheetInvariants:
    @pytest.fixture(scope="class")
    def ds(self, spark):
        return q_plan_corpus_datasheet(spark, SF).collect()

    def test_gates_bounded_by_docs(self, ds):
        for r in ds:
            assert 0 <= r["n_pass_gopher"] <= r["n_docs"]
            assert 0 <= r["n_pass_c4"] <= r["n_docs"]
            assert 0 <= r["n_dup_docs"] < r["n_docs"] or r["n_docs"] == 0

    def test_totals_match_corpus(self, spark, ds):
        d = spark.read.parquet(f"{SF}/documents.parquet")
        assert sum(r["n_docs"] for r in ds) == d.count()
        # every (source, lang) appears exactly once
        assert len({(r["source"], r["lang"]) for r in ds}) == len(ds)

    def test_fertility_is_half_up_ppm(self, ds):
        for r in ds:
            if r["n_tokens"] > 0:
                num = 2 * r["n_pieces"] * 1_000_000 + r["n_tokens"]
                assert r["ppw_ppm"] == num // (2 * r["n_tokens"])
                assert r["ppw_ppm"] >= 1_000_000  # pieces >= words
            else:
                assert r["ppw_ppm"] == 0


class TestCrossSourceDupAccounting:
    def test_dup_group_charges_each_source_its_members(self, spark,
                                                       tmp_path):
        # one text shared across two sources: keeper is the global min
        # doc_id, so source A (holding the keeper) reports 1 dup of 2
        # docs and source B reports its whole copy as dup
        rows = [(1, "same text here", "en", "A", 1),
                (2, "same text here", "en", "A", 1),
                (3, "same text here", "en", "B", 1),
                (4, "unique text", "en", "B", 1)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
                  " n_chars long")
        p = str(tmp_path / "documents.parquet")
        df.write.parquet(p)
        # the plan reads <sf_dir>/documents.parquet
        got = {(r["source"], r["lang"]): r
               for r in q_plan_corpus_datasheet(
                   spark, str(tmp_path)).collect()}
        assert got[("A", "en")]["n_dup_docs"] == 1
        assert got[("B", "en")]["n_dup_docs"] == 1
        assert got[("B", "en")]["n_docs"] == 2
