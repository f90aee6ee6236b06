"""Unit coverage for the stats/ER/integrity operators added late in
round 5 (operators/stats.py, relational.fuzzy_join, text-bigram-lift):
closed-form regression vs numpy, MAD outlier semantics, checksum
order/partition invariance + sensitivity, fuzzy-join blocking recall.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators.relational import fuzzy_join
from tf_prisma_api_data_ingestion_spark.operators.stats import (
    grouped_linreg,
    mad_outliers,
    table_checksum,
)


# ---------------------------------------------------------------- linreg

def test_grouped_linreg_matches_numpy(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 24, size=200)
    ys = np.round(1.5 * xs + 3 + rng.normal(0, 2, size=200), 2)
    rows = [("g", int(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g STRING, x LONG, y DOUBLE")
    got = grouped_linreg(df, "g", F.col("x"), F.col("y")).collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    assert got.n == 200
    assert got.slope == pytest.approx(slope, abs=1e-6)
    assert got.intercept == pytest.approx(intercept, abs=1e-6)
    assert got.r2 == pytest.approx(r * r, abs=1e-6)


def test_grouped_linreg_partition_invariant(spark):
    rows = [("a", i % 5, float(i % 7) + 0.25) for i in range(100)]
    df = spark.createDataFrame(rows, "g STRING, x LONG, y DOUBLE")
    one = grouped_linreg(df.coalesce(1), "g", F.col("x"), F.col("y")).collect()
    many = grouped_linreg(df.repartition(7), "g", F.col("x"),
                          F.col("y")).collect()
    assert one == many  # exact-sum formulation: bit-identical, not approx


def test_grouped_linreg_perfect_fit(spark):
    rows = [("g", x, round(2.0 * x + 1.0, 2)) for x in range(10)]
    df = spark.createDataFrame(rows, "g STRING, x LONG, y DOUBLE")
    got = grouped_linreg(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert (got.slope, got.intercept, got.r2) == (2.0, 1.0, 1.0)


# ------------------------------------------------------------------- mad

def test_mad_outliers_flags_only_the_spike(spark):
    # 9 values tightly around 10.00, one spike at 99.99
    vals = [10.0, 10.1, 9.9, 10.05, 9.95, 10.0, 10.2, 9.8, 10.0, 99.99]
    df = spark.createDataFrame([("g", v) for v in vals], "g STRING, v DOUBLE")
    got = mad_outliers(df, "g", F.col("v"), k=3.0).collect()[0]
    assert got.n == 10
    assert got.n_outliers == 1
    assert got.median_value == pytest.approx(10.0)
    assert got.mad_value == pytest.approx(0.075)  # interpolated on cents


def test_mad_outliers_all_equal_no_outliers(spark):
    df = spark.createDataFrame([("g", 5.0)] * 8, "g STRING, v DOUBLE")
    got = mad_outliers(df, "g", F.col("v")).collect()[0]
    assert (got.n_outliers, got.median_value, got.mad_value) == (0, 5.0, 0.0)


# -------------------------------------------------------------- checksum

def _checksum_row(df):
    return table_checksum(df, ["a", "b"]).collect()[0]


def test_table_checksum_order_and_partition_invariant(spark):
    rows = [(str(i), f"v{i % 13}") for i in range(500)]
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    base = _checksum_row(df.coalesce(1))
    shuf = _checksum_row(df.orderBy(F.rand(42)).repartition(11))
    assert (base.n_rows, base.xor_digest, base.sum_digest) == \
        (shuf.n_rows, shuf.xor_digest, shuf.sum_digest)


def test_table_checksum_detects_single_cell_change(spark):
    rows = [(str(i), "x") for i in range(100)]
    mutated = rows.copy()
    mutated[50] = ("50", "y")
    a = _checksum_row(spark.createDataFrame(rows, "a STRING, b STRING"))
    b = _checksum_row(spark.createDataFrame(mutated, "a STRING, b STRING"))
    assert a.n_rows == b.n_rows
    assert (a.xor_digest, a.sum_digest) != (b.xor_digest, b.sum_digest)


# ------------------------------------------------------------ fuzzy join

def test_fuzzy_join_blocked_pairs(spark):
    names = ["red widget", "ted widget", "red gadget", "tiny bolt"]
    df = spark.createDataFrame([(n,) for n in names], "name STRING")
    got = fuzzy_join(df.select(F.col("name").alias("name1")),
                     df.select(F.col("name").alias("name2")),
                     "name1", "name2",
                     F.element_at(F.split(F.col("name1"), " "), -1),
                     F.element_at(F.split(F.col("name2"), " "), -1),
                     max_dist=3)
    pairs = {(r.name1, r.name2) for r in got.collect()
             if r.name1 < r.name2}
    # same block (widget) and dist<=3: red~ted widget (1 edit)
    assert ("red widget", "ted widget") in pairs
    # different blocks are never compared even though dist is small
    assert ("red gadget", "red widget") not in pairs
    # singleton block pairs only with itself (filtered by name1<name2)
    assert not any("bolt" in a and "bolt" not in b for a, b in pairs)


def test_fuzzy_join_distance_bound(spark):
    df = spark.createDataFrame(
        [("aaaa zz",), ("bbbb zz",)], "name STRING")
    got = fuzzy_join(df.select(F.col("name").alias("name1")),
                     df.select(F.col("name").alias("name2")),
                     "name1", "name2",
                     F.element_at(F.split(F.col("name1"), " "), -1),
                     F.element_at(F.split(F.col("name2"), " "), -1),
                     max_dist=3)
    pairs = [(r.name1, r.name2) for r in got.collect() if r.name1 != r.name2]
    assert pairs == []  # dist 4 > bound 3, despite shared block


# ---------------------------------------------------------- expectations

def test_expect_counts_violations_per_rule(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, 0.0)],
        "k INT, v DOUBLE")
    from tf_prisma_api_data_ingestion_spark.operators.stats import expect
    got = {r.rule: r for r in expect(df, {
        "k_not_null": F.col("k").isNotNull(),
        "v_positive": F.col("v") > 0,
    }).collect()}
    assert got["k_not_null"].n_violations == 1
    assert got["k_not_null"].passed == 0
    assert got["v_positive"].n_violations == 2     # -5.0 and 0.0
    assert all(r.n_rows == 4 for r in got.values())


def test_expect_null_rule_result_counts_as_violation(spark):
    # v > 0 on a NULL v evaluates to NULL -> conservative: violation
    df = spark.createDataFrame([(1, None), (2, 1.0)], "k INT, v DOUBLE")
    from tf_prisma_api_data_ingestion_spark.operators.stats import expect
    got = {r.rule: r for r in expect(df, {
        "v_positive": F.col("v") > 0}).collect()}
    assert got["v_positive"].n_violations == 1


def test_expect_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "k INT")
    from tf_prisma_api_data_ingestion_spark.operators.stats import expect
    got = expect(df, {"k_not_null": F.col("k").isNotNull()}).collect()[0]
    assert (got.n_violations, got.passed) == (0, 1)


# ------------------------------------------------------- winsorized mean

def test_winsorized_mean_caps_the_tail(spark):
    from tf_prisma_api_data_ingestion_spark.operators.stats import (
        winsorized_mean,
    )
    # 19 values at 10.00 and one at 1000.00: plain mean 59.5, winsorized
    # mean stays near 10 because the spike is clamped to p95
    vals = [10.0] * 19 + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g STRING, v DOUBLE")
    got = winsorized_mean(df, "g", F.col("v"), lo=0.05, hi=0.95).collect()[0]
    assert got.n == 20
    assert got.win_mean < 20.0
    assert got.p_lo == pytest.approx(10.0)


def test_winsorized_mean_identity_when_no_tail(spark):
    from tf_prisma_api_data_ingestion_spark.operators.stats import (
        winsorized_mean,
    )
    df = spark.createDataFrame([("g", 7.5)] * 10, "g STRING, v DOUBLE")
    got = winsorized_mean(df, "g", F.col("v")).collect()[0]
    assert (got.win_mean, got.p_lo, got.p_hi) == (7.5, 7.5, 7.5)


# -------------------------------------------------------- passage dedup

def _passage_df(spark, docs):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(docs)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")


def test_passage_dedup_finds_aligned_shared_passages(spark, tmp_path):
    import os
    P = " ".join(f"w{i}" for i in range(16))          # the shared passage
    pre8 = " ".join(f"p{i}" for i in range(8))
    docs = [
        P,                                # doc0: the passage alone
        P + " tail tokens here",          # doc1: passage at offset 0
        pre8 + " " + P,                   # doc2: passage at offset 8 (on-stride)
        " ".join(f"z{i}" for i in range(20)),  # doc3: unrelated
    ]
    d = str(tmp_path / "sf"); os.makedirs(d, exist_ok=True)
    _passage_df(spark, docs).write.parquet(f"{d}/documents.parquet")
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_dedup_passage_exact,
    )
    got = q_dedup_passage_exact(spark, d).collect()
    assert len(got) == 1                  # exactly the shared passage hash
    assert got[0].n_docs == 3
    assert got[0].n_occurrences == 3


def test_passage_dedup_stride_miss_documented(spark, tmp_path):
    # a passage at offset 3 is NOT on the stride-8 grid: windowed exact
    # dedup trades recall at unaligned offsets for linear cost (the
    # documented stride trade-off; stride=1 recovers full recall at
    # window x cost)
    import os
    P = " ".join(f"w{i}" for i in range(16))
    pre3 = "a b c"
    docs = [P, pre3 + " " + P]
    d = str(tmp_path / "sf"); os.makedirs(d, exist_ok=True)
    _passage_df(spark, docs).write.parquet(f"{d}/documents.parquet")
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_dedup_passage_exact,
    )
    assert q_dedup_passage_exact(spark, d).count() == 0


# ------------------------------------------------------------ table diff

def test_table_diff_labels(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import (
        table_diff,
    )
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")],
        "k LONG, price DOUBLE, status STRING")
    new = spark.createDataFrame(
        [(1, 10.0, "A"),          # unchanged -> absent from output
         (2, 21.0, "B"),          # price changed
         (4, 40.0, "D")],         # added; key 3 removed
        "k LONG, price DOUBLE, status STRING")
    got = {r.k: r for r in
           table_diff(old, new, ["k"], ["price", "status"]).collect()}
    assert set(got) == {2, 3, 4}
    assert got[2].change_type == "changed"
    assert (got[2].o_price, got[2].n_price) == (20.0, 21.0)
    assert got[3].change_type == "removed"
    assert got[3].n_price is None
    assert got[4].change_type == "added"
    assert got[4].o_status is None


def test_table_diff_null_safe_compare(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import (
        table_diff,
    )
    old = spark.createDataFrame([(1, None), (2, None)],
                                "k LONG, v STRING")
    new = spark.createDataFrame([(1, None), (2, "x")],
                                "k LONG, v STRING")
    got = {r.k: r.change_type
           for r in table_diff(old, new, ["k"], ["v"]).collect()}
    # NULL == NULL is "same" under eqNullSafe: key 1 unchanged
    assert got == {2: "changed"}


def test_passage_pairs_rollup_and_hot_cap(spark, tmp_path):
    import os
    P = " ".join(f"w{i}" for i in range(16))
    Q = " ".join(f"q{i}" for i in range(16))
    hot = " ".join(f"h{i}" for i in range(16))
    # docs 0,1 share THREE passages (P at 0, the P/Q straddle at 8, and
    # Q at 16 — all on-stride); docs 2,3 share only ONE (P) -> below the
    # >=2 pair threshold. 'hot' appears in 40 docs -> capped out,
    # contributes no pairs.
    docs = [P + " " + Q, P + " " + Q, P + " tail a b c", P + " x y z tail"]
    docs += [hot] * 40
    d = str(tmp_path / "sf"); os.makedirs(d, exist_ok=True)
    _passage_df(spark, docs).write.parquet(f"{d}/documents.parquet")
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_dedup_passage_pairs,
    )
    got = {(r.doc1, r.doc2): r.n_shared_passages
           for r in q_dedup_passage_pairs(spark, d).collect()}
    assert got == {(0, 1): 3}


def test_fuzzy_canonicalize_merges_near_names(spark, tmp_path):
    import os
    d = str(tmp_path / "sf"); os.makedirs(d, exist_ok=True)
    rows = [(1, "red widget", "bx", "tx", 1, 10.0),
            (2, "ted widget", "bx", "tx", 1, 20.0),   # dist 1 from red
            (3, "tiny bolt", "bx", "tx", 1, 5.0)]
    spark.createDataFrame(
        rows, "p_partkey LONG, p_name STRING, p_brand STRING, "
              "p_type STRING, p_size INT, p_retailprice DOUBLE"
    ).write.parquet(f"{d}/part.parquet")
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_op_fuzzy_canonicalize,
    )
    got = {r.canon_name: (r.n_parts, r.total_price)
           for r in q_op_fuzzy_canonicalize(spark, d).collect()}
    # red/ted merge under the lexicographic min 'red widget'
    assert got == {"red widget": (2, 30.0), "tiny bolt": (1, 5.0)}
