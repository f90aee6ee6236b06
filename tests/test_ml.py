"""Unit/property tests for the round-6b ML-pipeline batch
(operators/ml.py + the stats/timeseries/similarity/relational additions).

Each operator gets (a) a hand-checkable example and (b) an invariant a
naive reimplementation would also satisfy — the same double-entry
bookkeeping the catalog's DuckDB oracles provide at sf0.01, but runnable
on adversarial micro-frames the parquet fixtures don't contain."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators import ml
from tf_prisma_api_data_ingestion_spark.operators.relational import (
    bloom_prefilter_semi_join,
)
from tf_prisma_api_data_ingestion_spark.operators.similarity import (
    quantize_int8_error,
)
from tf_prisma_api_data_ingestion_spark.operators.stats import (
    benford_profile,
    key_profile,
)
from tf_prisma_api_data_ingestion_spark.operators.timeseries import (
    seasonal_anomaly,
)


def test_knn_classify_majority_and_ties(spark):
    # corpus: label 1 clustered near +x, label 2 near +y; query at +x
    rows = [(i, [1.0, 0.0, 0.0], 1) for i in range(3)]
    rows += [(10 + i, [0.0, 1.0, 0.0], 2) for i in range(3)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    q = spark.createDataFrame([(100, [0.9, 0.1, 0.0])],
                              "vec_id long, embedding array<double>")
    out = ml.knn_classify(q, corpus, k=3).collect()
    assert len(out) == 1
    assert out[0].pred_label == 1 and out[0].votes == 3

    # exact vote tie at k=4 (2 vs 2): the smaller label wins
    corpus22 = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0], 2), (1, [1.0, 0.0, 0.0], 2),
         (10, [0.0, 1.0, 0.0], 1), (11, [0.0, 1.0, 0.0], 1)],
        "vec_id long, embedding array<double>, label int")
    q2 = spark.createDataFrame([(101, [1.0, 1.0, 0.0])],
                               "vec_id long, embedding array<double>")
    out2 = ml.knn_classify(q2, corpus22, k=4).collect()[0]
    assert out2.votes == 2 and out2.pred_label == 1


def test_item_item_cf_cosine_and_rank(spark):
    # baskets: {1,2} x3, {1,3} x1 -> sim(1,2)=3/sqrt(4*3), sim(1,3)=1/sqrt(4*2)
    rows = [(b, i) for b in (1, 2, 3) for i in (1, 2)] + [(4, 1), (4, 3)]
    df = spark.createDataFrame(rows, "basket long, item long")
    out = {(r.item_a, r.item_b): r for r in
           ml.item_item_cf(df, "basket", "item", min_support=1, k=5).collect()}
    assert out[(1, 2)].co == 3
    assert abs(out[(1, 2)].sim_r - 3 / (4 * 3) ** 0.5) < 1e-6
    assert abs(out[(1, 3)].sim_r - 1 / (4 * 1) ** 0.5) < 1e-6
    # both orientations exist and item 1's ranking puts 2 first
    assert out[(2, 1)].co == 3 and out[(1, 2)].rank == 1
    assert out[(1, 3)].rank == 2


def test_target_encode_shrinks_toward_global(spark):
    rows = [("a", 1)] * 90 + [("a", 0)] * 10 + [("b", 1)] * 1 + [("c", 0)] * 99
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r.category: r for r in
           ml.target_encode(df, "cat", F.col("y"), smoothing=20.0).collect()}
    g = 91 / 200
    # rare category 'b' (n=1, rate=1.0) shrinks almost all the way to g
    assert out["b"].rate_r == 1.0
    assert abs(out["b"].enc_r - (1 + 20 * g) / 21) < 1e-6
    # common categories sit between their rate and the global mean
    assert g < out["a"].enc_r < 0.9
    assert 0.0 < out["c"].enc_r < g


def test_chi2_terms_flags_the_discriminative_token(spark):
    pos = [(i, "alpha common filler", 1) for i in range(10)]
    neg = [(100 + i, "beta common filler", 0) for i in range(10)]
    df = spark.createDataFrame(pos + neg, "doc_id long, text string, y int")
    out = ml.chi2_terms(df, "text", F.col("y"), top_k=4, min_df=1).collect()
    scores = {r.term: r.chi2_r for r in out}
    # alpha/beta perfectly split the classes: chi2 = N = 20
    assert scores["alpha"] == 20.0 and scores["beta"] == 20.0
    # tokens present everywhere carry zero signal
    assert scores["common"] == 0.0
    assert out[0].term in ("alpha", "beta")


def test_welch_ttest_zero_for_identical_groups(spark):
    rows = [("a", float(v)) for v in (1, 2, 3, 4)] \
        + [("b", float(v)) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, value double")
    r = ml.welch_ttest(df, "g", F.col("value"), "a", "b").collect()[0]
    assert r.n_a == 4 and r.n_b == 4
    assert r.t_r == 0.0 and r.mean_a_r == r.mean_b_r == 2.5
    assert r.df_r == 6.0  # equal n, equal var -> df = n1+n2-2


def test_weighted_sample_size_and_heavy_row_guarantee(spark):
    # one row owns >1/k of a shard's weight -> always selected
    rows = [(i, 100) for i in range(200)] + [(999, 1_000_000)]
    df = spark.createDataFrame(rows, "k long, w long")
    out = ml.weighted_systematic_sample(df, "k", F.col("w"),
                                        per_shard=4, shards=8)
    picked = {r.key for r in out.collect()}
    assert 999 in picked
    # per shard the threshold crossings total exactly per_shard
    per = (out.groupBy("shard").count().collect())
    assert all(r["count"] <= 4 for r in per)
    assert sum(r["count"] for r in per) <= 4 * 8
    # deterministic: a second run picks the identical set
    again = {r.key for r in ml.weighted_systematic_sample(
        df, "k", F.col("w"), per_shard=4, shards=8).collect()}
    assert picked == again


def test_markov_transitions_counts_and_normalization(spark):
    t0 = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "a", "b", "c"]
    rows = [(i, t0 + dt.timedelta(minutes=i), 1, s)
            for i, s in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, state string")
    out = ml.markov_transitions(df, "user_id", "state", ["ts", "event_id"])
    rowsd = {(r.src, r.dst): r for r in out.collect()}
    assert rowsd[("a", "b")].n == 2 and rowsd[("a", "b")].p_r == 1.0
    assert rowsd[("b", "a")].p_r == 0.5 and rowsd[("b", "c")].p_r == 0.5
    # per-source probabilities sum to 1
    sums = (out.groupBy("src").agg(F.round(F.sum("p_r"), 6).alias("s"))
               .collect())
    assert all(abs(r.s - 1.0) < 1e-5 for r in sums)


def test_benford_profile_digits_and_shares(spark):
    rows = [(float(d) * 10 + 0.23,) for d in range(1, 10) for _ in range(d)]
    df = spark.createDataFrame(rows, "amt double")
    out = {r.digit: r for r in benford_profile(df, F.col("amt")).collect()}
    assert set(out) == set(range(1, 10))
    assert out[9].n == 9 and abs(out[9].obs_r - 9 / 45) < 1e-6
    assert abs(sum(r.obs_r for r in out.values()) - 1.0) < 1e-4
    assert out[1].exp_r == 0.301030


def test_key_profile_skew_invariants(spark):
    rows = [(1,)] * 50 + [(k,) for k in range(2, 12)]
    df = spark.createDataFrame(rows, "k long")
    r = key_profile(df, "k").collect()[0]
    assert r.n_keys == 11 and r.n_rows == 60 and r.max_cnt == 50
    assert abs(r.top_share - 50 / 60) < 1e-6
    assert abs(r.skew_ratio - 50 / (60 / 11)) < 1e-3


def test_seasonal_anomaly_flags_injected_spike(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(10):
        for hod in (3, 12):
            n = 5
            if day == 7 and hod == 3:
                n = 50  # the spike
            for j in range(n):
                rows.append((eid, t0 + dt.timedelta(days=day, hours=hod,
                                                    seconds=j)))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = seasonal_anomaly(df, "ts", z_threshold=2.0).collect()
    spike = [r for r in out if r.n == 50]
    assert len(spike) == 1 and spike[0].hod == 3 and spike[0].z_r > 2.0


def test_quantize_int8_error_bound_and_constant_dim(spark):
    rows = [(i, [float(i), 7.0, i * 0.5]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = df.sparkSession.createDataFrame(
        quantize_int8_error(df).collect())
    # worst-case error of mid-rise quantization is scale/2 per dimension
    max_scale = max((63.0 - 0.0) / 255.0, (31.5 - 0.0) / 255.0)
    assert out.filter(F.col("max_err_r") > max_scale / 2 + 1e-9).count() == 0
    # endpoints are representable exactly -> vec 0 and vec 63 have 0 error
    ends = {r.vec_id: r.max_err_r for r in out.collect()}
    assert ends[0] == 0.0 and ends[63] == 0.0


def test_bloom_prefilter_matches_exact_semi_join(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("payload"))
    small = spark.createDataFrame([(3,), (11,), (500,), (996,), (12345,)],
                                  "sk long")
    got = bloom_prefilter_semi_join(big, small, "k", "sk", m_bits=1 << 12)
    exact = big.join(small, big.k == small.sk, "left_semi")
    assert got.count() == exact.count()
    assert {r.payload for r in got.collect()} \
        == {r.payload for r in exact.collect()}


def test_bloom_prefilter_empty_small_side(spark):
    big = spark.range(0, 100).select(F.col("id").alias("k"))
    small = spark.createDataFrame([], "sk long")
    assert bloom_prefilter_semi_join(big, small, "k", "sk",
                                     m_bits=1 << 8).count() == 0


def test_bloom_prefilter_hash_dial(spark):
    # both probe hashes give identical answers (false positives die in
    # the exact join); 'md5' stays available for cross-engine bitmaps
    big = spark.createDataFrame([(i,) for i in range(200)], "k long")
    small = spark.createDataFrame([(i,) for i in range(0, 200, 7)],
                                  "sk long")
    xx = bloom_prefilter_semi_join(big, small, "k", "sk",
                                   m_bits=1 << 12, hash_fn="xx")
    md5 = bloom_prefilter_semi_join(big, small, "k", "sk",
                                    m_bits=1 << 12, hash_fn="md5")
    assert sorted(r["k"] for r in xx.collect()) == \
        sorted(r["k"] for r in md5.collect()) == list(range(0, 200, 7))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hash_fn"):
        bloom_prefilter_semi_join(big, small, "k", "sk", hash_fn="sha")
