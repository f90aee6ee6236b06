"""Unit tests for the round-6c drift / diversity / association / LM
batch (operators/ml.py ks_drift, drift_bins, gini_diversity, cramers_v;
operators/text.py lm_likelihood).

Hand-computed micro-fixtures plus the degenerate shapes the parquet
fixtures don't contain (one-sided samples, single-level categoricals,
sub-bigram documents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.operators import ml
from tf_prisma_api_data_ingestion_spark.operators.text import lm_likelihood


def test_ks_drift_hand_example(spark):
    # ref: bins 1,1,2,3 ; cur: bins 2,3,3,3
    # ECDF_ref = 1:.5  2:.75 3:1 ; ECDF_cur = 1:0 2:.25 3:1
    # KS = max(.5, .5, 0) = 0.5
    rows = [(1, 0), (1, 0), (2, 0), (3, 0),
            (2, 1), (3, 1), (3, 1), (3, 1)]
    df = spark.createDataFrame(rows, "bin long, c int")
    out = ml.ks_drift(df, F.col("bin"), F.col("c") == 1).collect()[0]
    assert (out.n_ref, out.n_cur, out.n_bins) == (4, 4, 3)
    assert out.ks_r == pytest.approx(0.5)


def test_ks_drift_identical_distributions_is_zero(spark):
    rows = [(b, c) for b in (1, 2, 3, 4) for c in (0, 1)]
    df = spark.createDataFrame(rows, "bin long, c int")
    out = ml.ks_drift(df, F.col("bin"), F.col("c") == 1).collect()[0]
    assert out.ks_r == 0.0


def test_ks_drift_one_sided_sample_is_null_not_error(spark):
    df = spark.createDataFrame([(1, 0), (2, 0)], "bin long, c int")
    out = ml.ks_drift(df, F.col("c") == 1, F.col("c") == 1)
    row = ml.ks_drift(df, F.col("bin"), F.col("c") == 1).collect()[0]
    assert row.n_cur == 0 and row.ks_r is None
    assert out.count() == 1  # total on the degenerate bin too


def test_drift_bins_shares_and_chi2(spark):
    # bin 1: ref 3 cur 1 ; bin 2: ref 1 cur 3  (n=8, bt=4 each)
    rows = [(1, 0)] * 3 + [(1, 1)] + [(2, 0)] + [(2, 1)] * 3
    df = spark.createDataFrame(rows, "bin long, c int")
    out = {r.bin: r for r in
           ml.drift_bins(df, F.col("bin"), F.col("c") == 1).collect()}
    assert out[1].n_ref == 3 and out[1].n_cur == 1
    assert out[1].p_ref_r == pytest.approx(0.75)
    assert out[1].p_cur_r == pytest.approx(0.25)
    # expected ref in bin1 = bt*tr/n = 4*4/8 = 2; term = (3-2)^2/2 = .5
    # cur term = (1-2)^2/2 = .5 ; chi2 = 1.0 — symmetric for bin 2
    assert out[1].chi2_r == pytest.approx(1.0)
    assert out[2].chi2_r == pytest.approx(1.0)


def test_gini_diversity_hand_example(spark):
    # group a: cats x,x,y,y -> gini = 1 - (4+4)/16 = .5, simpson = 2
    # group b: cats x,x,x,x -> gini = 0, simpson = 1
    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
            ("b", "x"), ("b", "x"), ("b", "x"), ("b", "x")]
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.grp: r for r in ml.gini_diversity(df, "g", "c").collect()}
    assert out["a"].gini_r == pytest.approx(0.5)
    assert out["a"].simpson_r == pytest.approx(2.0)
    assert out["a"].n_cats == 2
    assert out["b"].gini_r == 0.0 and out["b"].simpson_r == 1.0


def test_cramers_v_perfect_association_is_one(spark):
    rows = [("a", "p")] * 5 + [("b", "q")] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    out = ml.cramers_v(df, "x", "y").collect()[0]
    assert (out.n, out.r_levels, out.c_levels) == (10, 2, 2)
    assert out.chi2_r == pytest.approx(10.0)  # chi2 = n for a perfect 2x2
    assert out.v_r == pytest.approx(1.0)


def test_cramers_v_independence_is_zero(spark):
    rows = [(x, y) for x in ("a", "b") for y in ("p", "q")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    out = ml.cramers_v(df, "x", "y").collect()[0]
    assert out.chi2_r == 0.0 and out.v_r == 0.0


def test_cramers_v_single_level_is_null(spark):
    df = spark.createDataFrame([("a", "p"), ("a", "q")], "x string, y string")
    out = ml.cramers_v(df, "x", "y").collect()[0]
    assert out.r_levels == 1 and out.v_r is None


def test_lm_likelihood_hand_example(spark):
    # corpus: d1 = "a b a b" -> bigrams (a,b)x2, (b,a)x1
    #         d2 = "a b"     -> (a,b)x1
    # c12: (a,b)=3, (b,a)=1 ; c1: a=3, b=1 ; V=2
    # P(b|a) = (3+1)/(3+2) = .8 ; P(a|b) = (1+1)/(1+2) = 2/3
    rows = [(1, "a b a b"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lm_likelihood(df).collect()}
    assert out[1].n_bigrams == 3
    # mean = (2*.8 + 2/3)/3 ; integer-scaled floor division truncates at
    # 1e-12, so compare to 6 decimals
    assert out[1].lm_ppm_r == pytest.approx(
        ((0.8 * 2 + 2 / 3) / 3) * 1e6, abs=1.0)
    assert out[2].lm_ppm_r == pytest.approx(0.8 * 1e6, abs=1.0)


def test_lm_likelihood_short_docs_dropped(spark):
    rows = [(1, "single"), (2, ""), (3, "two tokens")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lm_likelihood(df).collect()
    assert [r.doc_id for r in out] == [3]
    assert out[0].n_bigrams == 1


def test_feature_store_orderless_customer_kept(spark):
    from tf_prisma_api_data_ingestion_spark.plans.features import (
        customer_feature_store,
    )
    import datetime as dt
    cust = spark.createDataFrame(
        [(1, "AUTO"), (2, "AUTO")], "c_custkey long, c_mktsegment string")
    orders = spark.createDataFrame(
        [(10, 1, dt.date(1997, 5, 1), "1-URGENT", 100.50),
         (11, 1, dt.date(1995, 1, 1), "3-MEDIUM", 10.25)],
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_orderpriority string, o_totalprice double")
    li = spark.createDataFrame(
        [(10,), (10,), (11,)], "l_orderkey long")
    out = {r.c_custkey: r
           for r in customer_feature_store(cust, orders, li).collect()}
    assert len(out) == 2
    a, b = out[1], out[2]
    assert a.frequency == 2 and a.monetary_cents == 11075
    assert a.recency_days == 0 and a.label_active == 1
    assert a.avg_lines_r == 1.5          # 3 lines / 2 orders
    assert a.fav_priority == "1-URGENT"  # count tie -> lexicographic min
    # orderless customer: kept, zeroed counters, NULL shape features
    assert b.frequency == 0 and b.monetary_cents == 0
    assert b.recency_days is None and b.avg_lines_r is None
    assert b.fav_priority is None and b.label_active == 0


def test_rag_contexts_diversity_drop(spark):
    from tf_prisma_api_data_ingestion_spark.plans.rag import rag_contexts
    # query doc 0: "alpha beta gamma". candidates: 1 and 2 are
    # near-identical (jaccard 1 > 4/5 -> 2 dropped), 3 shares one term.
    rows = [(0, "alpha beta gamma"),
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "alpha zulu yankee xray whisky victor")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rag_contexts(df, n_queries=1, k=3)
    got = [(r.rank, r.doc_id) for r in out.collect()]
    # 1 and 2 tie exactly; id asc puts 1 first, 2 dies to diversity,
    # 3 survives as the second (diverse) context
    assert got == [(1, 1), (2, 3)]


def test_rag_contexts_no_shared_terms_empty(spark):
    from tf_prisma_api_data_ingestion_spark.plans.rag import rag_contexts
    rows = [(0, "alpha beta"), (1, "gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert rag_contexts(df, n_queries=1, k=3).count() == 0


def test_markov_self_eval_hand_example(spark):
    import datetime as dt
    # user 1: a->b, b->a, a->b ; user 2: a->c
    # counts: (a,b)=2, (b,a)=1, (a,c)=1 -> model: a->b, b->a
    # hits = n(a,b) + n(b,a) = 3 of 4 steps
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    seq1 = ["a", "b", "a", "b"]
    for i, s in enumerate(seq1):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, s))
    for i, s in enumerate(["a", "c"]):
        rows.append((10 + i, t0 + dt.timedelta(minutes=i), 2, s))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = ml.markov_self_eval(df, "user_id", "event_type",
                              ["ts", "event_id"]).collect()[0]
    assert (out.n_steps, out.n_hits) == (4, 3)
    assert out.acc_r == 0.75


def test_streaming_drift_uniform_window_terms_small(spark):
    # the sf0.001 fixture: streamed per-window histograms must agree
    # with a batch recomputation of the same cells (engine parity is
    # the oracle's job; here we pin the invariant sum(n_bin) == N)
    from tf_prisma_api_data_ingestion_spark.streaming.windows import (
        streaming_drift,
    )
    from tf_prisma_api_data_ingestion_spark import tables
    sf = "/root/testdata/sf0.001"
    out = streaming_drift(spark, sf, query_name="t_stream_drift")
    total = out.agg(F.sum("n_bin")).collect()[0][0]
    n = tables.load(spark, sf, "events").count()
    assert total == n
    assert out.filter(F.col("chi2_term_r") < 0).count() == 0


def test_te_calibration_bins_partition_rows(spark):
    rows = [("a", 1), ("a", 0), ("a", 1), ("b", 0), ("b", 0), ("b", 1)]
    df = spark.createDataFrame(rows, "c string, y int")
    out = ml.te_calibration(df, "c", F.col("y"), bins=4, smoothing=0.0)
    rs = out.collect()
    assert sum(r.n for r in rs) == 6
    for r in rs:
        # mean predicted and observed rate are both probabilities
        assert 0.0 <= r.mean_pred_r <= 1.0 and 0.0 <= r.rate_r <= 1.0
    # with smoothing=0 the encoder IS the per-category rate, so within a
    # single-category bin prediction equals observation exactly
    by_bin = {r.bin: r for r in rs}
    for r in by_bin.values():
        assert r.mean_pred_r == pytest.approx(r.rate_r, abs=1e-6)


def test_negative_sample_determinism_and_correction(spark):
    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "u long, it long")
    items = spark.createDataFrame(
        [(10,), (11,), (12,), (13,)], "it long")
    out1 = ml.negative_sample(pos, items, "u", "it", m=3).collect()
    out2 = ml.negative_sample(pos, items, "u", "it", m=3).collect()
    assert out1 == out2                      # reproducible draw
    for r in out1:
        assert r.neg_item in (10, 11, 12, 13)
        if r.user == 1:
            assert r.neg_item not in (10, 11)  # true positives corrected
        else:
            assert r.neg_item != 10
    assert len(out1) <= 3 * 3                # collisions only remove rows


def test_auc_hand_examples(spark):
    # perfect separation: scores 1,2 with labels 0,1 -> AUC 1.0
    df = spark.createDataFrame(
        [(1, 0), (1, 0), (2, 1), (2, 1)], "s long, y int")
    out = ml.auc_score(df, F.col("s"), F.col("y")).collect()[0]
    assert (out.n_pos, out.n_neg) == (2, 2)
    assert out.auc_r == 1.0
    # all tied: AUC 0.5 exactly (tie-averaged ranks)
    df2 = spark.createDataFrame([(5, 0), (5, 1)], "s long, y int")
    assert ml.auc_score(df2, F.col("s"), F.col("y")).collect()[0].auc_r == 0.5
    # anti-predictive: AUC 0.0
    df3 = spark.createDataFrame([(2, 0), (1, 1)], "s long, y int")
    assert ml.auc_score(df3, F.col("s"), F.col("y")).collect()[0].auc_r == 0.0


def test_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(1, 1), (2, 1)], "s long, y int")
    assert ml.auc_score(df, F.col("s"), F.col("y")).collect()[0].auc_r is None


def test_auc_matches_sklearn_formula(spark):
    # tie-heavy fixture checked against the hand rank-sum:
    # scores [1,1,2,3,3,3], labels [0,1,0,0,1,1]
    # ranks: 1,1 -> 1.5 ; 2 -> 3 ; 3,3,3 -> 5
    # R_pos = 1.5 + 5 + 5 = 11.5 ; U = 11.5 - 3*4/2 = 5.5 ; AUC = 5.5/9
    rows = [(1, 0), (1, 1), (2, 0), (3, 0), (3, 1), (3, 1)]
    df = spark.createDataFrame(rows, "s long, y int")
    out = ml.auc_score(df, F.col("s"), F.col("y")).collect()[0]
    assert out.auc_r == pytest.approx(5.5 / 9, abs=1e-6)


def test_session_features_hand_example(spark):
    import datetime as dt
    from tf_prisma_api_data_ingestion_spark.plans.features import (
        session_features,
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "view", 0.0),
        (1, t0 + dt.timedelta(minutes=5), "purchase", 19.99),
        (1, t0 + dt.timedelta(hours=2), "view", 0.0),     # new session
        (2, t0, "click", 1.50),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    out = {(r.user_id, r.session_id): r
           for r in session_features(df).collect()}
    s1 = out[("1", 1)]
    assert s1.n_events == 2 and s1.converted == 1
    assert s1.value_cents == 1999 and s1.duration_us == 300_000_000
    s2 = out[("1", 2)]
    assert s2.n_events == 1 and s2.converted == 0 and s2.duration_us == 0
    assert out[("2", 1)].n_clicks == 1
