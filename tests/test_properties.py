"""Property-based tests (hypothesis) for the parity-critical paths: the
semantics here were hand-matched against urllib/pandas behavior, so
generated inputs guard the edge cases a fixed fixture list misses.

One Spark job per example is expensive — examples are batched into a
single DataFrame per test run where possible and max_examples kept low.
"""

from __future__ import annotations

import urllib.parse

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark.functions.columns import url_encode_path
from tf_prisma_api_data_ingestion_spark.operators.relational import union_all
from tf_prisma_api_data_ingestion_spark.operators.text import token_count

# printable ASCII + a few multi-byte chars; surrogates excluded
TEXTISH = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                           exclude_categories=("Cs",)),
    max_size=40)


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=20))
def test_url_encode_parity_generated(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    got = [r.e for r in df.select(url_encode_path(F.col("s")).alias("e")).collect()]
    want = [urllib.parse.quote(s) for s in strings]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=20))
def test_token_count_matches_ascii_ws_split(spark, strings):
    import re
    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    got = [r.n for r in df.select(token_count(F.col("s")).alias("n")).collect()]
    # documented semantics: ASCII \s separators (Java regex / RE2 parity),
    # empty tokens dropped — NOT python str.split()'s unicode whitespace
    want = [len([t for t in re.split("[ \t\n\x0b\f\r]+", s) if t])
            for s in strings]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(allow_nan=False,
                                               allow_infinity=False,
                                               width=32)),
                min_size=1, max_size=15))
def test_fillna_never_leaves_numeric_nulls(spark, values):
    from tf_prisma_api_data_ingestion_spark.operators.relational import fill_nulls
    rows = [(i, v) for i, v in enumerate(values)]  # unique ids by construction
    df = spark.createDataFrame(rows, "id LONG, v DOUBLE")
    got = {r.id: r.v for r in fill_nulls(df, 0.0).collect()}
    for i, v in rows:
        assert got[i] == (0.0 if v is None else v)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["u", "v"]), st.integers(0, 50)),
                min_size=1, max_size=12),
       st.lists(st.tuples(st.sampled_from(["u", "v"]), st.integers(0, 50),
                          st.integers(-100, 100)),
                min_size=0, max_size=12))
def test_asof_join_matches_python_reference(spark, left_rows, right_rows):
    from tf_prisma_api_data_ingestion_spark.operators.relational import asof_join
    # dedupe right on (key, ts): with duplicates "the most recent row" is
    # ambiguous and the operator documents no tie order
    seen = {}
    for k, ts, v in right_rows:
        seen[(k, ts)] = v
    right_rows = [(k, ts, v) for (k, ts), v in seen.items()]
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left_rows)],
        "lid INT, k STRING, ts LONG")
    right = (spark.createDataFrame(right_rows, "k STRING, ts LONG, v LONG")
             if right_rows else
             spark.createDataFrame([], "k STRING, ts LONG, v LONG"))
    got = {r.lid: r.last_v for r in
           asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                     right_cols={"v": "last_v"}).collect()}
    for i, (k, ts) in enumerate(left_rows):
        prior = [(rts, v) for rk, rts, v in right_rows if rk == k and rts <= ts]
        want = max(prior)[1] if prior else None
        assert got[i] == want, (i, k, ts)


def test_salted_join_equals_plain_join(spark):
    from tf_prisma_api_data_ingestion_spark.operators.relational import salted_join
    left = spark.createDataFrame(
        [(1, i) for i in range(40)] + [(2, 100)], "key INT, uid INT")
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "miss")],
                                  "key INT, tag STRING")
    got = sorted((r.key, r.uid, r.tag) for r in
                 salted_join(left, right, ["key"], salt=4,
                             left_unique="uid").collect())
    want = sorted((r.key, r.uid, r.tag) for r in
                  left.join(right, "key").collect())
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=1, max_size=8))
def test_union_all_row_count_is_sum(spark, sizes):
    frames = [
        spark.createDataFrame([(i, j) for j in range(n)] or [(i, 0)],
                              "branch INT, v INT").limit(n)
        for i, n in enumerate(sizes)
    ]
    total = union_all(frames).count()
    assert total == sum(sizes)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1,
                max_size=6))
def test_word_ngrams_matches_naive(spark, texts):
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.operators.text import word_ngrams
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id INT, text STRING")
    got = {r.doc_id: r.g for r in
           df.select("doc_id", word_ngrams(F.col("text"), 3).alias("g")).collect()}
    for i, t in enumerate(texts):
        toks = [w for w in t.strip().lower().split() if w]
        if not toks:
            want = []
        elif len(toks) <= 3:
            want = [" ".join(toks)]
        else:
            want = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        assert got[i] == want, (t, got[i], want)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="xy z", min_size=0, max_size=40), min_size=1,
                max_size=5))
def test_dup_frac_bounded(spark, texts):
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        repetition_features)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id INT, text STRING")
    for r in repetition_features(df, id_col="doc_id").collect():
        assert 0.0 <= r.dup_frac <= 1.0
        assert r.n_distinct <= r.n_grams


def test_star_cluster_id_is_min_member(spark):
    # cluster_id must be a member of its own cluster and the minimum one
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        dedup_clusters_star)
    pairs = spark.createDataFrame(
        [(3, 7), (7, 9), (2, 4), (11, 3)], "doc_a LONG, doc_b LONG")
    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    rows = dedup_clusters_star(pairs, ids).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members), (cid, members)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 30)),
                min_size=1, max_size=25))
def test_merge_intervals_matches_python_reference(spark, raw):
    """merge_intervals == the obvious single-threaded sweep: sort by
    start, extend the current island while start <= running max end."""
    from tf_prisma_api_data_ingestion_spark.operators.timeseries import (
        merge_intervals,
    )
    rows = [("k", s, s + ln, i) for i, (s, ln) in enumerate(raw)]
    df = spark.createDataFrame(rows, "k STRING, s LONG, e LONG, iid INT")
    got = sorted((r.island_start, r.island_end, r.n_intervals)
                 for r in merge_intervals(df, "k", "s", "e", "iid").collect())

    want = []
    for _, s, e, _ in sorted(rows, key=lambda r: (r[1], r[3])):
        if want and s <= want[-1][1]:
            lo, hi, n = want[-1]
            want[-1] = (lo, max(hi, e), n + 1)
        else:
            want.append((s, e, 1))
    # reference keeps running max implicitly because islands only close
    # when start exceeds the island's max end seen so far
    assert got == sorted((lo, hi, n) for lo, hi, n in want)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 100)),
                min_size=1, max_size=30))
def test_merge_upsert_equals_dict_semantics(spark, kv):
    """Latest-wins merge == feeding the rows through a dict in seq order
    (ties broken by the trailing unique id)."""
    from tf_prisma_api_data_ingestion_spark.operators.relational import (
        merge_upsert,
    )
    rows = [(k, seq, i) for i, (k, seq) in enumerate(kv)]
    half = len(rows) // 2
    # sentinel key 99 stands in for an empty half (createDataFrame needs
    # at least one row); it participates in the semantics like any key
    t_rows = rows[:half] or [(99, -1, -1)]
    u_rows = rows[half:] or [(99, -1, -2)]
    target = spark.createDataFrame(t_rows, "k INT, seq INT, uid INT")
    updates = spark.createDataFrame(u_rows, "k INT, seq INT, uid INT")
    got = {r.k: (r.seq, r.uid)
           for r in merge_upsert(target, updates, ["k"], ["seq", "uid"]).collect()}
    want = {}
    for k, seq, uid in sorted(t_rows + u_rows, key=lambda r: (r[1], r[2])):
        want[k] = (seq, uid)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20),
                          st.floats(allow_nan=False, allow_infinity=False,
                                    width=16)),
                min_size=1, max_size=25))
def test_scd2_intervals_partition_the_timeline(spark, raw):
    """Per key: intervals chain exactly (each valid_to equals the next
    valid_from), exactly one open interval, and it is the max-ts row."""
    from tf_prisma_api_data_ingestion_spark.operators.timeseries import (
        scd2_intervals,
    )
    rows = [(k, ts, i, float(v)) for i, (k, ts, v) in enumerate(raw)]
    df = spark.createDataFrame(rows, "k INT, ts LONG, cid INT, v DOUBLE")
    out = scd2_intervals(df, ["k"], "ts", "cid").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: (r.valid_from, r.cid))
        opens = [r for r in rs if r.valid_to is None]
        assert len(opens) == 1 and opens[0].is_current == 1
        assert opens[0] is rs[-1]
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            assert a.is_current == 0


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 15),
                          st.integers(-50, 50)),
                min_size=1, max_size=20))
def test_gap_fill_matches_pandas_ffill(spark, raw):
    """gap_fill == pandas reindex-to-full-range + ffill per key."""
    import datetime

    import pandas as pd

    from tf_prisma_api_data_ingestion_spark.operators.timeseries import gap_fill

    # one row per (key, day): keep the last value per duplicate day
    dedup = {}
    for k, day, v in raw:
        dedup[(k, day)] = float(v)
    rows = [(k, datetime.date(2024, 1, 1) + datetime.timedelta(days=day), v)
            for (k, day), v in dedup.items()]
    df = spark.createDataFrame(rows, "k INT, d DATE, v DOUBLE")
    got = {(r.k, r.d): r.filled for r in gap_fill(df, "k", "d", "v").collect()}

    pdf = pd.DataFrame(rows, columns=["k", "d", "v"])
    want = {}
    for k, grp in pdf.groupby("k"):
        s = grp.set_index("d")["v"].sort_index()
        full = s.reindex(pd.date_range(s.index.min(), s.index.max(),
                                       freq="D").date).ffill()
        for d, v in full.items():
            want[(k, d)] = v
    assert got == want


# ------------------------------------------------ round-6 equivalences

WORD = st.sampled_from([f"w{i}" for i in range(12)])
DOC = st.lists(WORD, min_size=0, max_size=14).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(DOC, min_size=2, max_size=14))
def test_prefix_filter_equals_exhaustive_generated(spark, docs):
    """Prefix filtering is LOSSLESS on arbitrary corpora: identical pair
    set and jaccard values as the exhaustive inverted-index join at the
    same threshold (the pigeonhole theorem, exercised on random small-
    vocabulary corpora where shared shingles are dense)."""
    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id LONG, text STRING")
    want = {(r.doc_a, r.doc_b, r.jaccard_r)
            for r in ngram_jaccard_pairs(df, n=3, threshold=0.6,
                                         max_df=None).collect()}
    got = {(r.doc_a, r.doc_b, r.jaccard_r)
           for r in prefix_filter_jaccard_pairs(df, n=3, t_num=3,
                                                t_den=5).collect()}
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 8)),
                min_size=1, max_size=30))
def test_skyline_equals_naive_domination(spark, pts):
    """The per-cost-group running-max rewrite equals the O(n²) naive
    domination filter on arbitrary point sets (including duplicates and
    full ties)."""
    from tf_prisma_api_data_ingestion_spark.operators.relational import (
        skyline_2d,
    )
    rows = [(i, float(c), b) for i, (c, b) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id LONG, cost DOUBLE, ben LONG")
    got = sorted(r.id for r in skyline_2d(df, "cost", "ben").collect())
    want = sorted(
        i for i, (c, b) in enumerate(pts)
        if not any((c2 <= c and b2 >= b and (c2 < c or b2 > b))
                   for c2, b2 in pts))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                min_size=1, max_size=40))
def test_triangle_counts_equal_naive_enumeration(spark, raw):
    """Degree-oriented wedge counting equals brute-force triangle
    enumeration on arbitrary small graphs (self-loops and duplicate
    edges dropped)."""
    from itertools import combinations

    from tf_prisma_api_data_ingestion_spark.operators.graph import (
        triangle_counts,
    )
    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "doc_a LONG, doc_b LONG")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    nodes = {n for e in edges for n in e}
    want: dict[int, int] = {}
    for x, y, z in combinations(sorted(nodes), 3):
        if ({(x, y), (x, z), (y, z)} <= edges):
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want


@given(st.integers(min_value=0, max_value=10**15),
       st.integers(min_value=1, max_value=10**12))
@settings(max_examples=60, deadline=None)
def test_integer_round_half_up_identity(a, b):
    # The (2a + b) DIV (2b) identity used by lm_likelihood /
    # feature-store / recall-audit / markov-eval: exact round-half-up
    # of a/b with no float boundary. Checked against Fraction math.
    from fractions import Fraction
    import math
    got = (2 * a + b) // (2 * b)
    frac = Fraction(a, b)
    want = math.floor(frac + Fraction(1, 2))
    assert got == want
