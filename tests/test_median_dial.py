"""Size-gated exact/approx median dial (r10 advice item 5): the
exact F.percentile path stays the oracle-gated default; the
percentile_approx twin is available for 100 TB hygiene passes where
one giant group would OOM an aggregation buffer, and 'auto' probes
the largest group size to pick. With odd-sized groups the sketch
returns the same element the exact path lands on, so the demo-scale
equivalence is bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators.similarity import (
    embedding_outliers)
from tf_prisma_api_data_ingestion_spark.operators.stats import (
    EXACT_MEDIAN_MAX_GROUP, mad_outliers)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _grouped(spark):
    # three groups, each ODD-sized, deviations well off the k*MAD line
    data = []
    for g, base in (("a", 100), ("b", 500), ("c", 40)):
        vals = [base - 2, base - 1, base, base + 1, base + 2,
                base + 3, base * 50]  # 7 rows; one wild outlier
        data += [(g, float(v)) for v in vals]
    return spark.createDataFrame(data, "grp string, y double")


class TestMadOutliersDial:
    def test_exact_and_approx_agree_on_odd_groups(self, spark):
        d = _grouped(spark)
        exact = mad_outliers(d, "grp", F.col("y"), median_mode="exact")
        approx = mad_outliers(d, "grp", F.col("y"), median_mode="approx")
        assert _rows(exact) == _rows(approx)
        got = {r["grp"]: r["n_outliers"] for r in exact.collect()}
        assert got == {"a": 1, "b": 1, "c": 1}

    def test_auto_picks_exact_below_threshold(self, spark):
        d = _grouped(spark)
        auto = mad_outliers(d, "grp", F.col("y"), median_mode="auto")
        exact = mad_outliers(d, "grp", F.col("y"), median_mode="exact")
        assert _rows(auto) == _rows(exact)

    def test_auto_switches_to_approx_above_threshold(self, spark):
        # force the dial with a tiny cap; with odd groups the result
        # is still identical, so this pins the BRANCH via plan shape
        d = _grouped(spark)
        auto = mad_outliers(d, "grp", F.col("y"), median_mode="auto",
                            exact_max_group=3)
        plan = auto._jdf.queryExecution().executedPlan().toString()
        assert "percentile_approx" in plan
        exact = mad_outliers(d, "grp", F.col("y"), median_mode="exact")
        assert _rows(auto) == _rows(exact)

    def test_unknown_mode_raises(self, spark):
        with pytest.raises(ValueError, match="median_mode"):
            mad_outliers(_grouped(spark), "grp", F.col("y"),
                         median_mode="sketchy")

    def test_default_plan_unchanged_exact(self, spark):
        plan = mad_outliers(_grouped(spark), "grp", F.col("y")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "percentile_approx" not in plan


class TestEmbeddingOutliersDial:
    def test_exact_and_approx_agree_at_demo_scale(self, spark):
        # EVEN-sized clusters are where the two modes can legitimately
        # differ (exact interpolates between the middle pair, approx
        # returns an element), so the corpus-level contract is
        # tolerance, not bit-equality: same clusters/sizes, flags
        # within 1, approx median inside the exact median ± MAD band.
        # Bit-equality on odd-sized groups is pinned by the
        # mad_outliers tests above, which share _median_fn.
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        e = {r["cluster"]: r for r in
             embedding_outliers(emb, median_mode="exact").collect()}
        a = {r["cluster"]: r for r in
             embedding_outliers(emb, median_mode="approx").collect()}
        assert set(e) == set(a)
        for c in e:
            assert e[c]["n"] == a[c]["n"]
            assert abs(e[c]["n_outliers"] - a[c]["n_outliers"]) <= 1
            assert abs(e[c]["median_d2"] - a[c]["median_d2"]) <= \
                max(e[c]["mad_d2"], 1.0)

    def test_auto_matches_exact_below_threshold(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        auto = embedding_outliers(emb, median_mode="auto")
        exact = embedding_outliers(emb, median_mode="exact")
        assert _rows(auto) == _rows(exact)

    def test_auto_forced_approx_takes_sketch_branch(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        forced = embedding_outliers(emb, median_mode="auto",
                                    exact_max_group=1)
        plan = forced._jdf.queryExecution().executedPlan().toString()
        assert "percentile_approx" in plan
        exact = {r["cluster"]: r for r in
                 embedding_outliers(emb, median_mode="exact").collect()}
        got = {r["cluster"]: r for r in forced.collect()}
        assert set(got) == set(exact)
        for c in got:
            assert got[c]["n"] == exact[c]["n"]
            assert abs(got[c]["n_outliers"]
                       - exact[c]["n_outliers"]) <= 1

    def test_threshold_constant_is_sane(self):
        assert 100_000 <= EXACT_MEDIAN_MAX_GROUP <= 50_000_000
