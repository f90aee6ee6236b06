"""Unit tests for operators/relational.py — hand-computed expectations
(SURVEY §5.3: the oracle-differential gate covers the big tables; these
pin the small semantics: null handling, missing columns, empty inputs,
tie-breaks, as-of equality visibility)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators.relational import (
    asof_join,
    empty_guard,
    fill_nulls,
    filter_eq,
    filter_in,
    filter_range,
    foreach_group,
    group_agg_count,
    limit_page,
    project_rename,
    sort_desc,
    top_k_per_group,
    union_all,
    upper_cols,
)


def _orders(spark):
    return spark.createDataFrame(
        [(1, "open", 10.0), (2, "open", 5.0), (3, "closed", 7.0), (4, "stale", 1.0)],
        "id INT, status STRING, amt DOUBLE")


def test_filter_eq(spark):
    assert {r.id for r in filter_eq(_orders(spark), "status", "open").collect()} == {1, 2}


def test_filter_in(spark):
    got = filter_in(_orders(spark), "status", ["closed", "stale"]).collect()
    assert {r.id for r in got} == {3, 4}


def test_filter_range_inclusive(spark):
    got = filter_range(_orders(spark), "amt", 5.0, 7.0).collect()
    assert {r.id for r in got} == {2, 3}  # both bounds inclusive


def test_sort_desc_with_tiebreak(spark):
    df = spark.createDataFrame([(1, 5), (2, 5), (3, 9)], "id INT, v INT")
    got = [r.id for r in sort_desc(df, ["v"], tiebreak=["id"]).collect()]
    assert got == [3, 1, 2]


def test_limit_page(spark):
    assert limit_page(_orders(spark).orderBy("id"), 2).count() == 2


def test_group_agg_count(spark):
    got = group_agg_count(_orders(spark), ["status"],
                          {"n": F.count("*"), "min_id": F.min("id")})
    rows = {r.status: (r.n, r.min_id) for r in got.collect()}
    assert rows == {"open": (2, 1), "closed": (1, 3), "stale": (1, 4)}


def test_project_rename_string_and_column(spark):
    got = project_rename(_orders(spark), {"Order Id": "id", "Status": F.lit("fail")})
    assert got.columns == ["Order Id", "Status"]
    assert got.first()["Status"] == "fail"


def test_upper_cols(spark):
    got = upper_cols(_orders(spark), ["status"]).filter(F.col("id") == 1).first()
    assert got.status == "OPEN"


def test_fill_nulls_type_matched(spark):
    df = spark.createDataFrame([(1, None, None)], "id INT, amt DOUBLE, name STRING")
    got = fill_nulls(fill_nulls(df, 0.0), "missing").first()
    assert got.amt == 0.0 and got.name == "missing"


def test_fill_nulls_subset(spark):
    df = spark.createDataFrame([(None, None)], "a DOUBLE, b DOUBLE")
    got = fill_nulls(df, 1.5, subset=["a"]).first()
    assert got.a == 1.5 and got.b is None


def test_union_all_by_name_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id INT, tag STRING")
    b = spark.createDataFrame([(2,)], "id INT")
    got = union_all([a, b]).orderBy("id").collect()
    assert [r.tag for r in got] == ["x", None]


def test_union_all_aligns_by_name_not_position(spark):
    a = spark.createDataFrame([("x", 1)], "tag STRING, id INT")
    b = spark.createDataFrame([(2, "y")], "id INT, tag STRING")
    got = union_all([a, b]).orderBy("id").collect()
    assert [(r.id, r.tag) for r in got] == [(1, "x"), (2, "y")]


def test_empty_guard_preserves_schema(spark):
    df = _orders(spark).filter(F.col("id") < 0)
    out = empty_guard(df)
    assert out.count() == 0 and out.schema == df.schema


def test_foreach_group_equals_groupby(spark):
    df = _orders(spark)

    def scan(k):
        return (df.filter(F.col("status") == k)
                  .groupBy("status").agg(F.count("*").alias("n")))

    got = {r.status: r.n for r in foreach_group(df, "status", scan).collect()}
    want = {r.status: r.n
            for r in df.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_top_k_per_group_with_ties(spark):
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 4.0), ("b", 4, 1.0)],
        "g STRING, id INT, v DOUBLE")
    got = top_k_per_group(df, ["g"], "v", 2, descending=True, tiebreak=["id"])
    assert {(r.g, r.id) for r in got.collect()} == {("a", 1), ("a", 2), ("b", 4)}


def test_asof_join_forward_fill_and_equality(spark):
    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 5), (4, "v", 10)],
        "lid INT, k STRING, ts LONG")
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 15, 2.0)], "k STRING, ts LONG, val DOUBLE")
    got = {r.lid: r.last_val for r in
           asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                     right_cols={"val": "last_val"}).collect()}
    # lid=1: right row at EXACTLY ts=10 is visible ("<=")
    # lid=2: forward-filled from ts=15; lid=3: nothing prior; lid=4: no key
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None}


def test_range_join_matches_naive(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import range_join
    points = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(40)], "pid LONG, x LONG")
    intervals = spark.createDataFrame(
        [(j, j * 13 % 80, j * 13 % 80 + 15) for j in range(12)],
        "iid LONG, lo LONG, hi LONG")
    got = {(r.pid, r.iid) for r in
           range_join(points, intervals, "x", "lo", "hi", bin_width=10).collect()}
    naive = {(r.pid, r.iid) for r in
             points.crossJoin(intervals)
                   .filter("x >= lo AND x <= hi").collect()}
    assert got == naive and len(naive) > 0


def test_range_join_emits_each_pair_once(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import range_join
    points = spark.createDataFrame([(1, 50)], "pid LONG, x LONG")
    # interval spans many bins; the pair must still appear exactly once
    intervals = spark.createDataFrame([(1, 0, 100)], "iid LONG, lo LONG, hi LONG")
    rows = range_join(points, intervals, "x", "lo", "hi", bin_width=10).collect()
    assert len(rows) == 1


def test_time_rollup_cascade_consistency(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import time_rollup
    data = [(i * 37 % 200000, float(i % 13) + 0.25) for i in range(500)]
    df = spark.createDataFrame(data, "sec LONG, v DOUBLE")
    out = time_rollup(df, "sec", "v").collect()
    by_grain = {}
    for r in out:
        g = by_grain.setdefault(r.grain, {"n": 0, "s": 0.0})
        g["n"] += r.n_events
        g["s"] += r.sum_value
    # every grain partitions the same input: identical totals
    assert by_grain["minute"]["n"] == by_grain["hour"]["n"] == by_grain["day"]["n"] == 500
    assert abs(by_grain["minute"]["s"] - by_grain["day"]["s"]) < 1e-6
    # buckets align to their grain
    assert all(r.bucket_start % 3600 == 0 for r in out if r.grain == "hour")
    assert all(r.bucket_start % 86400 == 0 for r in out if r.grain == "day")


def test_asof_join_forward_hand_computed(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import asof_join
    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 25), (3, "v", 5)],
        "lid INT, k STRING, ts LONG")
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, 2.0)], "k STRING, ts LONG, val DOUBLE")
    got = {r.lid: r.v for r in
           asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                     right_cols={"val": "v"}, direction="forward").collect()}
    # lid 1: right at exactly ts=10 is eligible (inclusive bound)
    # lid 2: no right row at/after 25 -> null; lid 3: no 'v' rows -> null
    assert got == {1: 1.0, 2: None, 3: None}


def test_asof_join_rejects_bad_direction(spark):
    import pytest as _pytest

    from tf_prisma_api_data_ingestion_spark.operators.relational import asof_join
    df = spark.createDataFrame([(1,)], "a INT")
    with _pytest.raises(ValueError, match="backward"):
        asof_join(df, df, on=["a"], left_ts="a", right_ts="a",
                  right_cols={}, direction="sideways")
