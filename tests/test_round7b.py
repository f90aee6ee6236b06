"""Round-7b data-selection/curation batch: invariants the differential
gate can't see (both engines implementing the same wrong rule would
still hash-match). Pins the semantics of dsir_importance,
ngram_novelty, semdedup, cluster_silhouette, and gopher_rules on
hand-built corpora with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ dsir

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_upweights_target_like_docs(spark):
    """A doc built from the target subset's vocabulary must outscore a
    doc built from vocabulary the target never uses."""
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        dsir_importance,
    )
    target_text = "the quick brown fox jumps over the lazy dog"
    rows = ([(i, target_text, "en") for i in range(5)]
            + [(10, target_text, "xx"),                 # target-like, unscored-as-target
               (11, "zzz qqq www eee rrr ttt yyy uuu", "xx")])  # alien vocab
    d = _docs(spark, rows)
    out = {r["doc_id"]: r["imp_ppm"] for r in
           dsir_importance(d, d.filter(F.col("lang") == "en"),
                           buckets=512).collect()}
    assert out[10] > out[11]


def test_dsir_scores_every_nonempty_doc_once(spark):
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        dsir_importance,
    )
    d = _docs(spark, [(1, "a b c", "en"), (2, "single", "xx"),
                      (3, "   ", "xx")])
    rows = dsir_importance(d, d.filter(F.col("lang") == "en"),
                           buckets=64).collect()
    got = {r["doc_id"]: r["n_bigrams"] for r in rows}
    # whitespace-only doc has no grams and drops out; the single-token
    # doc contributes its full token string as one gram (word_ngrams)
    assert got == {1: 2, 2: 1}


# --------------------------------------------------------------- novelty

def test_novelty_extremes(spark):
    """A doc identical to reference text scores 0; a doc sharing nothing
    scores exactly 1e6."""
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        ngram_novelty,
    )
    ref = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta", "en")])
    probe = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta", "en"),   # covered
        (2, "one two three four five six seven", "en"),     # all new
    ])
    out = {r["doc_id"]: r["novel_ppm"] for r in
           ngram_novelty(probe, ref, n=5).collect()}
    assert out[1] == 0
    assert out[2] == 1000000


def test_novelty_half_up_ppm(spark):
    """1 novel gram of 3 -> round(1e6/3) = 333333; 2 of 3 -> 666667."""
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        ngram_novelty,
    )
    ref = _docs(spark, [(100, "a b c d e f g", "en")])
    # 7 tokens -> 3 distinct 5-grams ("a b c d e", "b c d e f",
    # "c d e f x"); the first two appear in ref, the third is novel:
    # round_half_up(1e6 * 1/3) = 333333
    probe = _docs(spark, [(1, "a b c d e f x", "en")])
    row = ngram_novelty(probe, ref, n=5).collect()[0]
    assert row["n_grams"] == 3
    assert row["novel_ppm"] == 333333


# -------------------------------------------------------------- semdedup

def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_semdedup_drops_exact_dups_keeps_lowest_id(spark):
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup,
    )
    v1 = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0, 0.0]
    d = _emb(spark, [(1, v1, 0), (2, v1, 0), (3, v1, 0),
                     (10, v2, 1), (11, v2, 1)])
    out = {r["vec_id"]: r["kept"] for r in semdedup(d, 17, 20).collect()}
    assert out == {1: True, 2: False, 3: False, 10: True, 11: False}


def test_semdedup_orthogonal_vectors_all_kept(spark):
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup,
    )
    d = _emb(spark, [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)])
    out = semdedup(d, 17, 20).collect()
    assert all(r["kept"] for r in out)


def test_semdedup_zero_vectors_never_match(spark):
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup,
    )
    d = _emb(spark, [(1, [0.0, 0.0], 0), (2, [0.0, 0.0], 0)])
    out = semdedup(d, 17, 20).collect()
    assert all(r["kept"] for r in out)


def test_semdedup_max_cluster_size_guard(spark):
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup,
    )
    d = _emb(spark, [(i, [1.0, float(i) / 100.0], 0) for i in range(5)])
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup(d, 17, 20, max_cluster_size=2)


def test_semdedup_threshold_is_exact_rational(spark):
    """cos = 0.8 sits below 17/20=0.85 (kept); cos = 0.9 above (dropped).
    Construct planar vectors with known cosines against [1, 0]."""
    import math
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup,
    )
    def at(cos):
        return [cos, math.sqrt(1 - cos * cos)]
    d = _emb(spark, [(1, [1.0, 0.0], 0), (2, at(0.8), 0), (3, at(0.9), 0)])
    out = {r["vec_id"]: r["kept"] for r in semdedup(d, 17, 20).collect()}
    assert out[2] is True      # 0.8 < 0.85: not a dup of vec 1
    assert out[3] is False     # 0.9 >= 0.85: dropped


# ------------------------------------------------------------ silhouette

def test_silhouette_well_separated_near_one(spark):
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        cluster_silhouette,
    )
    d = _emb(spark, [(1, [1.0, 0.0], 0), (2, [1.0, 0.01], 0),
                     (3, [-1.0, 0.0], 1), (4, [-1.0, 0.01], 1)])
    rows = cluster_silhouette(d).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["mean_sil_ppm"] > 990000  # tight clusters, far apart


def test_silhouette_single_cluster_empty(spark):
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        cluster_silhouette,
    )
    d = _emb(spark, [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0)])
    assert cluster_silhouette(d).count() == 0


def test_silhouette_range_and_assignment_not_label(spark):
    """A vector labeled 1 but sitting on cluster 0's centroid is ASSIGNED
    to 0 — geometric assignment, not the label column."""
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        assign_nearest_centroid,
    )
    d = _emb(spark, [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
                     (3, [-1.0, 0.0], 1), (4, [-1.0, 0.0], 1),
                     (5, [0.95, 0.0], 1)])   # mislabeled straggler
    # centroids: 0 -> ~(1, 0) pulled by 2 members; 1 -> (-0.35, 0)
    out = {r["vec_id"]: r["cluster"] for r in
           assign_nearest_centroid(d).collect()}
    assert out[5] == 0


# ---------------------------------------------------------- gopher rules

def test_gopher_rules_battery(spark):
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        gopher_rules,
    )
    good = " ".join(["the quick brown fox jumps over that lazy dog and"] * 6)
    short = "the cat"
    symbolic = " ".join(["the #tag and"] * 20)
    bullets = "\n".join(["- item the and of"] * 10)
    d = spark.createDataFrame(
        [(1, good), (2, short), (3, symbolic), (4, bullets)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(d).collect()}
    assert out[1]["pass_gopher"] is True
    assert out[2]["r_words"] is False and out[2]["pass_gopher"] is False
    assert out[3]["r_symbol"] is False   # 20 '#' in 60 words > 10%
    assert out[4]["r_bullet"] is False   # 100% bullet lines


def test_gopher_mean_word_length_bounds(spark):
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        gopher_rules,
    )
    tiny = " ".join(["a b"] * 30)                       # mean len 1 < 3
    huge = " ".join(["pneumonoultramicroscopic"] * 60)  # mean len 24 > 10
    d = spark.createDataFrame([(1, tiny), (2, huge)],
                              "doc_id long, text string")
    out = {r["doc_id"]: r["r_mean_len"] for r in gopher_rules(d).collect()}
    assert out == {1: False, 2: False}


# ------------------------------------------------------- executed plans
# Same contract as test_round7's plan pins: a Spark bump or conf drift
# that silently de-optimizes these shapes fails CI, not a bench.

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_gopher_rules_is_pure_map(spark):
    """The cheapest full-corpus pass must stay scan -> project: any
    Exchange or Join appearing here is a regression by definition."""
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_text_gopher_rules,
    )
    plan = _plan(q_text_gopher_rules(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_dsir_score_broadcasts_bucket_stats(spark):
    """The <=4096-row bucket-stats frame must come back as a broadcast
    join — a sort-merge join here would shuffle the corpus-sized
    (doc, bucket) frame a second time."""
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_text_dsir_score,
    )
    plan = _plan(q_text_dsir_score(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_and_silhouette_plan_shapes(spark):
    """Default engines: the assignment runs as a vectorized mapInPandas
    (MLlib-style broadcast centroid matrix — no n x K row frame) and
    the SemDeDup pair stage as one Arrow group per cluster; nothing
    degenerates into a CartesianProduct. The pure-DataFrame array
    engine must keep its broadcast nested-loop centroid join (the
    oracle-mirrored shape)."""
    from tf_prisma_api_data_ingestion_spark import tables
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_sim_semdedup,
        q_sim_silhouette,
    )
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        assign_nearest_centroid,
    )
    plan = _plan(q_sim_semdedup(spark, SF))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    plan = _plan(q_sim_silhouette(spark, SF))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    emb = tables.load(spark, SF, "embeddings")
    plan = _plan(assign_nearest_centroid(emb, engine="array"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------ curation report

def test_curation_report_funnel_invariants(spark):
    """n_selected <= n_pass_gopher <= n_docs per row, and the doc total
    matches the corpus."""
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_plan_curation_report,
    )
    from tf_prisma_api_data_ingestion_spark import tables
    rows = q_plan_curation_report(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_pass_gopher"] <= r["n_docs"]
        if r["n_selected"] == 0:
            assert r["tok_selected"] == 0
    total = sum(r["n_docs"] for r in rows)
    assert total == tables.load(spark, SF, "documents").count()


# -------------------------------------------------------- corpus TV

def test_corpus_tv_identical_group_is_zero(spark):
    """A group whose token distribution IS the corpus distribution has
    TV = 0 (two identical sources)."""
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        corpus_tv_distance,
    )
    d = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s2")],
        "doc_id long, text string, source string")
    out = {r["source"]: r["tv_ppm"] for r in
           corpus_tv_distance(d, "source").collect()}
    assert out == {"s1": 0, "s2": 0}


def test_corpus_tv_disjoint_vocab(spark):
    """Two equal-mass groups with disjoint vocabularies: each group's
    distance from the 50/50 corpus mix is exactly 0.5 (500000 ppm)."""
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        corpus_tv_distance,
    )
    d = spark.createDataFrame(
        [(1, "aaa bbb ccc", "s1"), (2, "xxx yyy zzz", "s2")],
        "doc_id long, text string, source string")
    out = {r["source"]: r["tv_ppm"] for r in
           corpus_tv_distance(d, "source").collect()}
    assert out == {"s1": 500000, "s2": 500000}


def test_corpus_tv_hand_value(spark):
    """s1 = {a: 2}, s2 = {a: 1, b: 1}; corpus = {a: 3, b: 1}.
    TV(s1) = 0.5*(|1 - 3/4| + |0 - 1/4|) = 0.25;
    TV(s2) = 0.5*(|1/2 - 3/4| + |1/2 - 1/4|) = 0.25."""
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        corpus_tv_distance,
    )
    d = spark.createDataFrame(
        [(1, "a a", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string")
    out = {r["source"]: r["tv_ppm"] for r in
           corpus_tv_distance(d, "source").collect()}
    assert out == {"s1": 250000, "s2": 250000}


# ------------------------------------------------- semdedup-clean funnel

def test_semdedup_clean_funnel_monotone(spark):
    """n_final <= n_exact <= n_gopher <= n_docs on the real tables, and
    totals reconcile with the corpus."""
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_plan_semdedup_clean,
    )
    from tf_prisma_api_data_ingestion_spark import tables
    rows = q_plan_semdedup_clean(spark, SF).collect()
    assert rows
    for r in rows:
        assert (0 <= r["n_final"] <= r["n_exact"]
                <= r["n_gopher"] <= r["n_docs"])
    total = sum(r["n_docs"] for r in rows)
    assert total == tables.load(spark, SF, "documents").count()


def test_semdedup_clean_semantic_stage_runs_on_survivors(spark):
    """A doc dropped by the gopher gates must not influence the
    semantic stage: its embedding is excluded before centroids fit.
    Construct: two semantically-identical docs where one fails gopher —
    the surviving one must be KEPT (its dup partner never reached the
    semantic stage)."""
    from tf_prisma_api_data_ingestion_spark.plans.corpus import (
        semdedup_clean,
    )
    good = " ".join(["the quick brown fox jumps over that lazy dog and"] * 6)
    docs = spark.createDataFrame(
        [(1, good, "s", "en"), (2, "the cat", "s", "en")],
        "doc_id long, text string, source string, lang string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int")
    row = semdedup_clean(docs, emb).collect()[0]
    assert row["n_docs"] == 2
    assert row["n_gopher"] == 1   # "the cat" fails word count
    assert row["n_exact"] == 1
    assert row["n_final"] == 1    # doc 1 kept: its dup never survived


def test_corpus_tv_and_funnel_plan_shapes(spark):
    """corpus-tv's bucket/group stats come back as broadcasts (no
    sort-merge of the corpus-sized counts frame); the funnel never
    degenerates into a cartesian product."""
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_plan_semdedup_clean,
        q_text_corpus_tv,
    )
    plan = _plan(q_text_corpus_tv(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    plan = _plan(q_plan_semdedup_clean(spark, SF))
    assert "CartesianProduct" not in plan


def test_r7b_ppm_outputs_bounded(spark):
    """Property sweep on the real corpus: every ppm this batch emits is
    inside [0, 1e6] (novelty, TV, silhouette — ratios by construction)."""
    from tf_prisma_api_data_ingestion_spark.catalog import (
        q_sim_silhouette,
        q_text_corpus_tv,
        q_text_novelty,
    )
    for q, col in ((q_text_novelty, "novel_ppm"),
                   (q_text_corpus_tv, "tv_ppm"),
                   (q_sim_silhouette, "mean_sil_ppm")):
        vals = [r[col] for r in q(spark, SF).collect()]
        assert vals and all(0 <= v <= 1000000 for v in vals), q.__name__


def test_semdedup_keeps_at_least_one_per_cluster(spark):
    """The keep-lowest-id rule can never empty a cluster: its minimum id
    has no lower-id neighbor."""
    from tf_prisma_api_data_ingestion_spark.catalog import q_sim_semdedup
    rows = q_sim_semdedup(spark, SF).collect()
    clusters = {r["cluster"] for r in rows}
    kept_clusters = {r["cluster"] for r in rows if r["kept"]}
    assert clusters == kept_clusters


# ---------------------------------------------------------- k-anonymity

def test_k_anonymity_hand_built(spark):
    """3-row class + 1-row class at k=2: one violating class, one
    violating row, min_l from the constant-sensitive class."""
    from tf_prisma_api_data_ingestion_spark.operators.stats import (
        k_anonymity_audit,
    )
    d = spark.createDataFrame(
        [("a", "x", 10.0), ("a", "x", 20.0), ("a", "x", 20.0),
         ("b", "y", 30.0)],
        "q1 string, q2 string, s double")
    row = k_anonymity_audit(d, ["q1", "q2"], k=2,
                            sensitive_col="s").collect()[0]
    assert row["n_rows"] == 4
    assert row["n_classes"] == 2
    assert row["min_class_size"] == 1
    assert row["n_violating_classes"] == 1
    assert row["n_violating_rows"] == 1
    assert row["min_l"] == 1    # class b/y has one distinct s


def test_k_anonymity_without_sensitive_col(spark):
    from tf_prisma_api_data_ingestion_spark.operators.stats import (
        k_anonymity_audit,
    )
    d = spark.createDataFrame([("a", 1.0)] * 5, "q string, s double")
    row = k_anonymity_audit(d, ["q"], k=5).collect()[0]
    assert row["n_violating_classes"] == 0
    assert "min_l" not in row.asDict()


# ------------------------------------------------- streaming quality gate

def test_stream_quality_gate_matches_batch(spark):
    """The streaming drain's per-source tallies equal the batch gopher
    pass computed on the same files — the stream adds delivery, not
    different math."""
    from pyspark.sql import functions as F2
    from tf_prisma_api_data_ingestion_spark import tables
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        gopher_rules,
    )
    from tf_prisma_api_data_ingestion_spark.streaming.windows import (
        streaming_quality_gate,
    )
    got = {r["source"]: (r["n_docs"], r["n_pass"]) for r in
           streaming_quality_gate(
               spark, SF, query_name="t_quality_gate").collect()}
    batch = (gopher_rules(tables.load(spark, SF, "documents"),
                          keep=("source",))
             .groupBy("source")
             .agg(F2.count(F2.lit(1)).alias("n"),
                  F2.sum(F2.when(F2.col("pass_gopher"), 1)
                          .otherwise(0)).alias("p")))
    want = {r["source"]: (r["n"], r["p"]) for r in batch.collect()}
    assert got == want


def test_semdedup_pair_modes_bit_identical(spark):
    """The Arrow matmul path and the pure-DataFrame zip_with path must
    produce identical rows — the float prefilter's slack only
    over-admits, the exact re-check restores the boundary."""
    import math
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup,
    )
    def at(cos):
        return [cos, math.sqrt(1 - cos * cos)]
    rows = [(i, at(0.78 + 0.01 * i), i % 2) for i in range(12)]
    rows += [(100, [0.0, 0.0], 0), (101, [1.0, 0.0], 1)]
    d = _emb(spark, rows)
    got_p = sorted(map(tuple, semdedup(d, 17, 20,
                                       pair_mode="pandas").collect()))
    got_a = sorted(map(tuple, semdedup(d, 17, 20,
                                       pair_mode="array").collect()))
    assert got_p == got_a


def test_assignment_engines_bit_identical(spark):
    """The mapInPandas assignment and the pure-DataFrame n x K frame
    must produce identical (cluster, d2_own) for every vector, and
    silhouette must match across engines too."""
    from tf_prisma_api_data_ingestion_spark import tables
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        assign_nearest_centroid,
        cluster_silhouette,
    )
    emb = tables.load(spark, SF, "embeddings")
    got_p = sorted(map(tuple,
                   assign_nearest_centroid(emb, engine="pandas").collect()))
    got_a = sorted(map(tuple,
                   assign_nearest_centroid(emb, engine="array").collect()))
    assert got_p == got_a
    sil_p = sorted(map(tuple,
                   cluster_silhouette(emb, engine="pandas").collect()))
    sil_a = sorted(map(tuple,
                   cluster_silhouette(emb, engine="array").collect()))
    assert sil_p == sil_a


# --------------------------------------------------- incremental semdedup

def test_semdedup_incremental_existing_wins(spark):
    """A new vector duplicating an EXISTING one is dropped regardless of
    id order; a genuinely new vector survives; existing rows never
    appear in the output."""
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup_incremental,
    )
    existing = _emb(spark, [(10, [1.0, 0.0], 0), (11, [0.0, 1.0], 1)])
    new = _emb(spark, [(1, [1.0, 0.0], 0),        # dup of existing 10
                       (2, [-1.0, 0.0], 0),       # novel direction
                       (3, [-1.0, 0.0], 0)])      # dup of NEW 2 (lower id)
    out = {r["vec_id"]: r["kept"] for r in
           semdedup_incremental(existing, new, 17, 20).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] is False     # killed by existing 10 despite lower id
    assert out[2] is True
    assert out[3] is False     # killed by new 2 (keep-lowest-id)


def test_semdedup_incremental_agrees_with_rebuild_on_new_ids(spark):
    """On the real table, an increment admitted against the rest must
    match what the full rebuild decides about those same ids whenever
    the rebuild's survivor for a neighborhood is an existing id (the
    contract's bit-identity clause)."""
    from pyspark.sql import functions as F2
    from tf_prisma_api_data_ingestion_spark import tables
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        semdedup_incremental,
    )
    e = tables.load(spark, SF, "embeddings")
    out = semdedup_incremental(e.filter(F2.col("vec_id") % 5 != 0),
                               e.filter(F2.col("vec_id") % 5 == 0),
                               17, 20)
    rows = out.collect()
    assert len(rows) == e.filter(F2.col("vec_id") % 5 == 0).count()
    assert all(r["kept"] in (True, False) for r in rows)


# ------------------------------------------- hypothesis property sweeps

from hypothesis import given, settings, strategies as st  # noqa: E402

_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6),
       st.lists(_DOC, min_size=1, max_size=6))
def test_novelty_matches_python_sets(spark, probe_texts, ref_texts):
    """novel_ppm == round_half_up(1e6 * |probe \\ ref| / |probe|) over
    python-set 2-gram ground truth (independent reimplementation)."""
    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        ngram_novelty,
    )

    def grams(text):
        t = text.split()
        if len(t) < 2:
            return {" ".join(t)}
        return {" ".join(t[i:i + 2]) for i in range(len(t) - 1)}

    ref_set = set().union(*(grams(t) for t in ref_texts))
    probe = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(probe_texts)],
        "doc_id long, text string, lang string")
    ref = spark.createDataFrame(
        [(100 + i, t, "en") for i, t in enumerate(ref_texts)],
        "doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["n_grams"], r["novel_ppm"]) for r in
           ngram_novelty(probe, ref, n=2).collect()}
    for i, t in enumerate(probe_texts):
        g = grams(t)
        novel = len(g - ref_set)
        want = (2 * novel * 1000000 + len(g)) // (2 * len(g))
        assert got[i] == (len(g), want), t


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2", "s3"]), _DOC),
                min_size=2, max_size=10).filter(
                    lambda rows: len({g for g, _ in rows}) >= 2))
def test_corpus_tv_matches_fractions(spark, rows):
    """tv_ppm == round_half_up(1e6 * TV) against an exact-Fraction
    python reimplementation over raw tokens (buckets=4096 is far above
    the 6-word vocabulary, so hashing is injective here w.h.p. — any
    collision would surface as a mismatch and be a real finding)."""
    from collections import Counter
    from fractions import Fraction

    from tf_prisma_api_data_ingestion_spark.operators.selection import (
        corpus_tv_distance,
    )
    d = spark.createDataFrame(
        [(i, t, g) for i, (g, t) in enumerate(rows)],
        "doc_id long, text string, source string")
    got = {r["source"]: r["tv_ppm"] for r in
           corpus_tv_distance(d, "source").collect()}
    corpus = Counter(w for _, t in rows for w in t.split())
    n = sum(corpus.values())
    by_src: dict[str, Counter] = {}
    for g, t in rows:
        by_src.setdefault(g, Counter()).update(t.split())
    for g, cnt in by_src.items():
        ns = sum(cnt.values())
        tv = Fraction(1, 2) * sum(
            abs(Fraction(cnt.get(w, 0), ns) - Fraction(c, n))
            for w, c in corpus.items())
        want = (2 * tv.numerator * 1000000 + tv.denominator) \
            // (2 * tv.denominator)
        assert got[g] == want, (g, tv)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2),
                          st.integers(0, 5)),
                min_size=1, max_size=25), st.integers(2, 5))
def test_k_anonymity_matches_python(spark, rows, k):
    from collections import Counter

    from tf_prisma_api_data_ingestion_spark.operators.stats import (
        k_anonymity_audit,
    )
    d = spark.createDataFrame(
        [(q1, q2, float(s)) for q1, q2, s in rows],
        "q1 int, q2 int, s double")
    got = k_anonymity_audit(d, ["q1", "q2"], k=k,
                            sensitive_col="s").collect()[0]
    classes = Counter((q1, q2) for q1, q2, _ in rows)
    lvals = {}
    for q1, q2, s in rows:
        lvals.setdefault((q1, q2), set()).add(s)
    assert got["n_rows"] == len(rows)
    assert got["n_classes"] == len(classes)
    assert got["min_class_size"] == min(classes.values())
    assert got["n_violating_classes"] == sum(
        1 for c in classes.values() if c < k)
    assert got["n_violating_rows"] == sum(
        c for c in classes.values() if c < k)
    assert got["min_l"] == min(len(v) for v in lvals.values())


# ------------------------------------------------------------ wma / corr

def test_wma_hand_values(spark):
    """k=4 taps, weights 8/4/2/1 newest-first; the head rows divide by
    the weights actually present."""
    from tf_prisma_api_data_ingestion_spark.operators.timeseries import (
        weighted_moving_average,
    )
    rows = [("a", i, float(v)) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0])]
    d = spark.createDataFrame(rows, "k string, t int, value double")
    out = {r["t"]: r["wma_micro"] for r in
           weighted_moving_average(d, "k", ["t"], "value", k=4).collect()}
    # t=0: 100c*8/8 = 100c -> 1_000_000 micro
    assert out[0] == 1000000
    # t=1: (200*8 + 100*4)/12 c = 2000/12 c -> round(166.66..c)*1e4
    assert out[1] == (2 * 2000 * 10000 + 12) // (2 * 12)
    # t=4 (full window): (500*8+400*4+300*2+200*1)/15 = 6400/15 c
    assert out[4] == (2 * 6400 * 10000 + 15) // (2 * 15)


def test_wma_negative_values_sign_aware(spark):
    from tf_prisma_api_data_ingestion_spark.operators.timeseries import (
        weighted_moving_average,
    )
    d = spark.createDataFrame([("a", 0, -1.0)], "k string, t int, value double")
    row = weighted_moving_average(d, "k", ["t"], "value", k=4).collect()[0]
    assert row["wma_micro"] == -1000000


def test_corr_matrix_known_relationships(spark):
    """y = 2x correlates exactly 1; an orthogonal pattern near 0."""
    import numpy as np
    from tf_prisma_api_data_ingestion_spark.operators.stats import (
        corr_matrix,
    )
    rng = np.random.default_rng(7)
    xs = rng.integers(1, 100, 200)
    zs = rng.integers(1, 100, 200)
    rows = [(float(x), float(2 * x), float(z))
            for x, z in zip(xs.tolist(), zs.tolist())]
    d = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r["corr6"]
           for r in corr_matrix(d, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == 1.0
    want = float(np.corrcoef(xs, zs)[0, 1])
    assert abs(out[("x", "z")] - want) < 1e-5


def test_corr_matrix_degenerate_null(spark):
    from tf_prisma_api_data_ingestion_spark.operators.stats import (
        corr_matrix,
    )
    d = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)],
                              "x double, y double")
    row = corr_matrix(d, ["x", "y"]).collect()[0]
    assert row["corr6"] is None


# ----------------------------------------------------------- kmeans step

def test_kmeans_step_pulls_centroid_to_members(spark):
    """A mislabeled point near cluster 0 is re-assigned there; the
    recomputed centroid is the exact mean of the ASSIGNED members and
    the abandoned cluster keeps its true members only."""
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        kmeans_step,
    )
    d = _emb(spark, [(1, [1.0, 0.0], 0), (2, [0.8, 0.0], 0),
                     (3, [-1.0, 0.0], 1), (4, [-0.8, 0.0], 1),
                     (5, [0.9, 0.0], 1)])   # mislabeled, sits in 0
    out = {(r["cluster"], r["dim"]): r for r in kmeans_step(d).collect()}
    # cluster 0 absorbs 5: n=3, mean dim0 = (1.0+0.8+0.9)/3 = 0.9
    assert out[(0, 0)]["n"] == 3
    assert out[(0, 0)]["mean_micro"] == 900000
    # cluster 1 keeps its two true members: mean = -0.9
    assert out[(1, 0)]["n"] == 2
    assert out[(1, 0)]["mean_micro"] == -900000


def test_kmeans_step_total_membership_preserved(spark):
    from tf_prisma_api_data_ingestion_spark import tables
    from tf_prisma_api_data_ingestion_spark.operators.similarity import (
        kmeans_step,
    )
    e = tables.load(spark, SF, "embeddings")
    out = kmeans_step(e)
    dim0 = out.filter(F.col("dim") == 0).collect()
    assert sum(r["n"] for r in dim0) == e.count()
