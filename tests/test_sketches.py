"""Sketch-op verification (no SQL oracle — algorithm-specific estimates):
error bounds against exact answers, per the catalog's rows-only notes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark import tables
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES

SF = "/root/testdata/sf0.01"


def test_hll_within_relative_error(spark):
    got = {r.event_type: r.approx_users
           for r in QUERIES["sketch-hll-distinct"](spark, SF).collect()}
    exact = {r.event_type: r.n for r in
             tables.load(spark, SF, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(2, 0.05 * n), (k, got[k], n)


def test_approx_quantile_within_rank_error(spark):
    got = {r.event_type: r.p50_approx
           for r in QUERIES["sketch-quantile"](spark, SF).collect()}
    ev = tables.load(spark, SF, "events")
    for k, approx in got.items():
        vals = sorted(r.value for r in
                      ev.filter(F.col("event_type") == k).select("value").collect())
        # GK sketch with accuracy 1000 targets rank error ~n/1000; allow
        # 1% of n as the practical bound (implementation constants)
        n = len(vals)
        tol = max(2, n // 100)
        lo, hi = vals[max(0, n // 2 - tol)], vals[min(n - 1, n // 2 + tol)]
        assert lo <= approx <= hi, (k, approx, lo, hi)


def test_hll_deterministic(spark):
    a = sorted(map(tuple, QUERIES["sketch-hll-distinct"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["sketch-hll-distinct"](spark, SF).collect()))
    assert a == b
