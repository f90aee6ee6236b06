"""Unit tests for sessionize, grouped_demean and the set-op catalog
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators.relational import (
    grouped_demean,
    sessionize,
)


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [("u", 0), ("u", 10), ("u", 25),      # session 1 (gaps 10, 15)
         ("u", 100), ("u", 110),              # session 2 (gap 75 > 20)
         ("v", 5)],                           # session 1 of v
        "k STRING, ts LONG")
    got = {(r.k, r.session_id): (r.session_start, r.session_end, r.n_events)
           for r in sessionize(df, "k", "ts", gap=20).collect()}
    assert got[("u", 1)] == (0, 25, 3)
    assert got[("u", 2)] == (100, 110, 2)
    assert got[("v", 1)] == (5, 5, 1)


def test_sessionize_boundary_gap_not_split(spark):
    # a gap EXACTLY equal to the threshold stays in the same session
    df = spark.createDataFrame([("u", 0), ("u", 20)], "k STRING, ts LONG")
    got = sessionize(df, "k", "ts", gap=20).collect()
    assert len(got) == 1 and got[0].n_events == 2


def test_grouped_demean_min_is_zero(spark):
    df = spark.createDataFrame(
        [("a", 3.0), ("a", 5.5), ("b", -2.0), ("b", 0.0)],
        "g STRING, v DOUBLE")
    got = grouped_demean(df, "g", "v")
    by_g = {}
    for r in got.collect():
        by_g.setdefault(r.g, []).append((r.v, r.value_centered))
    assert sorted(by_g["a"]) == [(3.0, 0.0), (5.5, 2.5)]
    assert sorted(by_g["b"]) == [(-2.0, 0.0), (0.0, 2.0)]


def test_subtract_is_set_semantics(spark):
    # the op-except lesson: bag vs set difference
    a = spark.createDataFrame([(1,), (1,), (2,)], "x INT")
    b = spark.createDataFrame([(1,)], "x INT")
    assert [r.x for r in a.subtract(b).collect()] == [2]
    assert sorted(r.x for r in a.exceptAll(b).collect()) == [1, 2]
