"""Data-selection operators for training-data curation (north-star
extensions, SURVEY.md §7.5): hashed n-gram importance scoring (DSIR,
Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"), n-gram novelty auditing against a reference corpus, and
per-group total-variation distance from the corpus token distribution
(the mixture-drift audit).

Scale design notes (the point of this module):
- DSIR reduces per-document scoring to ONE aggregation of the raw bigram
  stream into (doc, bucket) multiplicities; the bucket statistics for
  both the source and target distributions derive from that same small
  frame (cardinality <= buckets, a broadcast), so the corpus is tokenized
  exactly once and the scoring join never shuffles the big side again.
- Novelty joins fixed-width 60-bit gram hashes instead of raw gram
  strings: the reference gram set is deduplicated BEFORE the join and the
  join key is a long, not a variable-length string — at 100 TB the
  reference set is itself corpus-sized, so this is a shuffle equi-join on
  a compact key (broadcast only if the reference is genuinely small).

Like the BM25/LM family in text.py, both operators are deliberately
log-free: every ratio is an exact scaled-integer division (Spark
DECIMAL(38,0) DIV == DuckDB HUGEINT //), so the DuckDB oracle twin
hash-matches bit-for-bit with no float ulp contract between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist
from .dedup import md5_hash60
from .text import word_ngrams


def dsir_importance(docs: DataFrame, target_ids: DataFrame,
                    buckets: int = 4096, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document DSIR-style importance score: how much more likely the
    document's hashed-bigram profile is under the TARGET distribution
    (the docs named by ``target_ids``) than under the full source corpus.
    Rank by it descending and take the head to curate a source corpus
    toward a target domain — the hashed n-gram variant of importance
    resampling (DSIR), which at 100 TB is the standard cheap alternative
    to a learned quality classifier.

    Formulation (log-free; same cross-engine ulp policy as
    text.lm_likelihood): word bigrams hash into ``buckets`` buckets via
    the 60-bit md5 primitive; with add-one smoothing over buckets the
    per-bucket likelihood ratio is

        r(g) = ((c_t(g)+1) * (N_s+B)) / ((c_s(g)+1) * (N_t+B))

    scaled to exact ppm integers with a DECIMAL(38,0) DIV, and the
    document score is the half-up integer mean of r over the document's
    bigram OCCURRENCES ((2S+n) DIV 2n — the arithmetic-mean-of-ratios
    form; DSIR's geometric mean needs ln, which has no bit-stable SQL
    replay). The ranking substitution is MEASURED, not argued:
    tests/test_round8.py rank-correlates this score against a float
    log-space geometric-mean reimplementation on adversarial mixed-
    vocabulary corpora (Spearman >= 0.9, top-quartile overlap >= 0.7
    asserted; observed ~0.98 / ~1.0 on seeded probes), and pins the
    integer output bit-for-bit to an independent replica.

    Scale design: the raw bigram stream aggregates to (doc, bucket)
    multiplicities FIRST (one shuffle); a SINGLE grouped pass over that
    frame produces c_s and c_t side by side (the target membership is a
    broadcast-joined flag, not a second scan), and the corpus totals
    come from a 1-partition window over the resulting <=B-row frame —
    so the whole bucket-stats computation is ONE broadcast subtree
    rooted at the persisted (doc, bucket) frame. That rooting is
    load-bearing: a first formulation hung c_s, c_t, and the two totals
    off the frame as four separate broadcast subqueries, and Spark
    executes broadcast futures CONCURRENTLY — they raced to materialize
    the persisted frame and each re-ran the tokenize+explode scan
    (measured 8 full corpus scans, 9x the wall of this shape). Returns
    (doc_id, n_bigrams, imp_ppm) for every doc with >= 1 bigram.
    """
    from pyspark.sql.window import Window

    grams = word_ngrams(F.col(text_col), n=2)
    stream = (docs
              .select(F.col(id_col).alias("doc_id"),
                      F.explode(grams).alias("_g"))
              .select("doc_id",
                      (md5_hash60(F.col("_g")) % buckets).alias("g")))
    # one shuffle: per-(doc, bucket) multiplicities; everything else
    # derives from this frame (cardinality <= docs * buckets, typically
    # ~docs * distinct-buckets-touched, far below the raw token stream).
    # Persisted as a recompute barrier: the bucket-stats broadcast and
    # the scoring probe would otherwise each re-run tokenize+explode.
    dm = tracked_persist(
        stream.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("m")))
    tids = F.broadcast(
        target_ids.select(F.col(id_col).alias("doc_id")).distinct()
                  .withColumn("_t", F.lit(1)))
    bstats = (dm.join(tids, "doc_id", "left")
                .groupBy("g")
                .agg(F.sum("m").alias("c_s"),
                     F.sum(F.when(F.col("_t").isNotNull(), F.col("m"))
                            .otherwise(0)).alias("c_t")))
    # corpus totals via a global window over the <=B-row frame (sum of
    # per-bucket sums == sum over the stream — no second pass, no
    # separate broadcast subtree); buckets the target never touched
    # keep c_t = 0 (the +1 smoothing handles them)
    w = Window.partitionBy(F.lit(1))
    stats = (bstats
             .withColumn("n_src",
                         F.sum("c_s").over(w).cast("decimal(38,0)"))
             .withColumn("n_tgt",
                         F.sum("c_t").over(w).cast("decimal(38,0)"))
             .withColumn("r", F.expr(
                 f"(CAST(c_t + 1 AS DECIMAL(38,0)) * (n_src + {buckets})"
                 f" * 1000000) DIV (CAST(c_s + 1 AS DECIMAL(38,0))"
                 f" * (n_tgt + {buckets}))"))
             .select("g", "r"))
    scored = dm.join(F.broadcast(stats), "g")
    return (scored.groupBy("doc_id")
                  .agg(F.sum("m").cast("long").alias("n_bigrams"),
                       # m is cast to DECIMAL(38,0) BEFORE the multiply:
                       # r is a LONG ppm ratio that scales with
                       # (n_src+B)/(n_tgt+B) for source-rare buckets, so
                       # the LONG product m*r can wrap int64 silently
                       # (non-ANSI) at corpus scale while the DuckDB
                       # twin is HUGEINT throughout
                       F.sum(F.col("m").cast("decimal(38,0)")
                             * F.col("r"))
                        .cast("decimal(38,0)").alias("_S"))
                  .select("doc_id", "n_bigrams",
                          # half-up integer mean in exact space (r >= 0)
                          F.expr("CAST((2 * _S + n_bigrams) DIV "
                                 "CAST(2 * n_bigrams AS DECIMAL(38,0))"
                                 " AS BIGINT)").alias("imp_ppm")))


def ngram_novelty(docs: DataFrame, ref: DataFrame, n: int = 5,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: the ppm
    fraction of the document's DISTINCT word n-grams that appear nowhere
    in ``ref`` — the memorization/novelty audit run before adding a new
    source to a training mix (a near-0 score means the source is already
    covered; a near-1e6 score means genuinely new text). The complement
    of the contamination check (text.contamination_hits matches a known
    benchmark list; this measures overlap with an arbitrary corpus).

    Scale design: both sides reduce to DISTINCT (id, gram-hash) /
    (gram-hash) frames before any join — the reference set is
    deduplicated once and joined on a fixed-width 60-bit key, so the
    probe is a compact-key equi-join (hash, not string, comparisons;
    broadcast it only when the reference is genuinely small — this
    operator deliberately does NOT force a broadcast). Grams shorter
    than ``n`` tokens follow word_ngrams' convention (the full token
    string as one gram), so short docs are still scored. Returns
    (doc_id, n_grams, novel_ppm) for every doc with >= 1 gram; the ppm
    is the half-up exact-integer division used across this package.
    """
    def g_hashes(frame: DataFrame) -> DataFrame:
        grams = word_ngrams(F.col(text_col), n=n)
        return (frame
                .select(F.col(id_col).alias("doc_id"),
                        F.explode(grams).alias("_g"))
                .select("doc_id", md5_hash60(F.col("_g")).alias("g"))
                .distinct())

    ref_set = g_hashes(ref).select("g").distinct()
    probe = g_hashes(docs)
    hits = (probe.join(ref_set.withColumn("_seen", F.lit(1)), "g", "left")
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_grams"),
                      F.sum(F.when(F.col("_seen").isNull(), 1)
                             .otherwise(0)).alias("novel")))
    return hits.select(
        "doc_id", F.col("n_grams").cast("long").alias("n_grams"),
        # half-up ppm in exact integer space: round(1e6 * novel / n)
        F.expr("CAST((2 * novel * 1000000 + n_grams) DIV (2 * n_grams)"
               " AS BIGINT)").alias("novel_ppm"))


def corpus_tv_distance(docs: DataFrame, group_col: str = "source",
                       buckets: int = 4096,
                       text_col: str = "text") -> DataFrame:
    """Per-group total-variation distance between the group's hashed
    token distribution and the whole corpus's — the mixture-drift audit
    run when a source's character changes between crawls (TV = 0: the
    group looks exactly like the corpus; TV -> 1e6 ppm: disjoint
    vocabulary). TV is the log-free two-sample distance (KL needs ln,
    which has no bit-stable SQL replay — same policy as the BM25/LM/
    DSIR family), and over hashed buckets it lower-bounds the true
    token-level TV.

    Exactness: TV = (1/2) sum_g |m_sg/N_s - m_g/N| is evaluated as
    integers: sum over the group's PRESENT buckets of |m_sg*N - m_g*N_s|
    plus (N - sum_present m_g) * N_s for the buckets the group never
    touches (their |0 - m_g/N| mass in closed form — no dense bucket
    frame is ever built), divided once by 2*N_s*N with half-up ppm
    rounding, all in DECIMAL(38,0).

    Scale design: ONE aggregation of the token stream into
    (group, bucket) counts (the only corpus-sized shuffle); bucket
    totals are a <=B-row broadcast carrying the corpus total as a
    1-partition window over themselves; group totals are a
    |groups|-row broadcast. Single broadcast subtree rooted at the
    persisted counts frame — same shape as dsir_importance, for the
    same racing-broadcast-futures reason. Returns
    (group, n_tokens, tv_ppm).
    """
    from pyspark.sql.window import Window

    stream = (docs
              .select(F.col(group_col).alias("grp"),
                      F.explode(F.filter(
                          F.split(F.trim(F.lower(F.col(text_col))),
                                  r"\s+"), lambda t: t != "")).alias("_t"))
              .select("grp", (md5_hash60(F.col("_t")) % buckets).alias("g")))
    sg = tracked_persist(
        stream.groupBy("grp", "g").agg(F.count(F.lit(1)).alias("m")))
    w = Window.partitionBy(F.lit(1))
    gtot = F.broadcast(
        sg.groupBy("g").agg(F.sum("m").alias("mg"))
          .withColumn("n", F.sum("mg").over(w).cast("decimal(38,0)")))
    stot = F.broadcast(
        sg.groupBy("grp").agg(F.sum("m").cast("decimal(38,0)").alias("ns")))
    per = (sg.join(gtot, "g").join(stot, "grp")
             .groupBy("grp")
             .agg(F.max("ns").alias("ns"),
                  F.max("n").alias("n"),
                  F.sum("mg").cast("decimal(38,0)").alias("_mgp"),
                  F.sum(F.abs(F.col("m").cast("decimal(38,0)") * F.col("n")
                              - F.col("mg").cast("decimal(38,0)")
                                * F.col("ns"))).alias("_bad")))
    return (per
            .withColumn("_tv2", F.col("_bad")
                        + (F.col("n") - F.col("_mgp")) * F.col("ns"))
            .select(F.col("grp").alias(group_col),
                    F.col("ns").cast("long").alias("n_tokens"),
                    # half-up ppm of _tv2 / (2*ns*n)
                    F.expr("CAST((2 * _tv2 * 1000000 + 2 * ns * n)"
                           " DIV (4 * ns * n) AS BIGINT)")
                     .alias("tv_ppm")))


def train_val_test_split(df: DataFrame, id_col: str = "doc_id",
                         val_ppm: int = 100_000, test_ppm: int = 100_000,
                         salt: str = "split",
                         out: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by identity hash: each
    row's 60-bit md5 of (salt, id) lands in a ppm bucket; the first
    ``test_ppm`` buckets are test, the next ``val_ppm`` are val, the
    rest train. The property that matters for a training corpus is
    STABILITY under growth: a document keeps its split forever — across
    re-crawls, backfills, engine changes, and partitioning — so
    yesterday's eval documents can never leak into tomorrow's training
    set (the split-side complement of text.contamination_hits, which
    guards against leakage from EXTERNAL benchmarks). ``df.randomSplit``
    has none of these properties (seed- and partitioning-dependent).

    ``salt`` decorrelates independent splits over the same corpus
    (ablations reusing ids would otherwise share fold boundaries).
    Proportions hold in expectation within every stratum automatically —
    md5 is independent of any document attribute, so no per-stratum
    bookkeeping (or shuffle) is needed: this is a pure map-side
    projection, the cheapest possible full-corpus pass. Pure integer
    thresholds (ppm of a fixed 1e6 denominator), exact in ANSI SQL.
    Returns df + ``out`` (string: train/val/test).
    """
    bucket = md5_hash60(
        F.concat_ws(",", F.lit(salt), F.col(id_col).cast("string"))
    ) % 1_000_000
    split = (F.when(bucket < test_ppm, F.lit("test"))
              .when(bucket < test_ppm + val_ppm, F.lit("val"))
              .otherwise(F.lit("train")))
    return df.withColumn(out, split)


# Demo weight vector for the catalog's quality-classifier key: a
# deterministic, seedless pseudo-random map (Knuth multiplicative hash
# of the bucket id into [-1000, 1000] micros) shared VERBATIM with the
# DuckDB oracle so both engines score from the same literal table. A
# production run passes real learned weights instead.
QUALITY_WEIGHTS_DEMO: dict[int, int] = {
    b: ((b * 2654435761) % 2001) - 1000 for b in range(64)
}


def hashed_linear_score(df: DataFrame, weights: dict[int, int],
                        buckets: int = 64, bias_micros: int = 0,
                        threshold_micros: int = 0, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Learned quality-classifier INFERENCE over hashed unigram features
    — the linear-model quality filter of the GPT-3 / CCNet pipelines
    (Brown et al. 2020 Appendix A; the logistic-regression-over-hashed-
    ngrams shape), the trained complement of the heuristic Gopher/C4
    gates and of DSIR's importance ratios. Training happens offline;
    what a 100 TB pipeline runs is exactly this: score every document
    with a fixed weight vector and keep what clears the bar.

    Formulation (log-free, exact): token t activates feature bucket
    ``md5_hash60(t) % buckets``; the document score is

        S = bias + sum over token OCCURRENCES of w[bucket(t)]

    in integer micros, and the mean score is the half-away-from-zero
    integer division S' = round(S / n_tokens) evaluated with the
    sign-split DIV both engines share. ``pass_quality`` fires at
    ``threshold_micros`` on the MEAN (length-invariant, like the
    sigmoid-threshold in the published filters).

    Scale shape: the weight vector rides into the plan as a LITERAL MAP
    (vocab-hashing means it is buckets-sized, not vocabulary-sized), so
    scoring is a pure map-side pass over one scan — zero shuffles, no
    broadcast, no UDF; the same cheapest-full-pass profile as
    gopher_rules/c4_rules. Missing buckets weigh 0 via try_element_at.
    Returns (id, n_tokens, score_sum_micros, score_mean_micros,
    pass_quality).
    """
    from .dedup import md5_hash60
    from .text import tokens

    wmap = F.create_map(
        *[F.lit(x) for b in sorted(weights) for x in (b, weights[b])])
    toks = tokens(F.col(text_col))
    per_tok = F.transform(
        toks, lambda t: F.coalesce(
            F.try_element_at(wmap, (md5_hash60(t) % buckets).cast("int")),
            F.lit(0)))
    s = (F.aggregate(per_tok, F.lit(0).cast("long"), lambda a, x: a + x)
         + F.lit(int(bias_micros)))
    n = F.size(toks).cast("long")
    mean = F.when(F.col("_n") > 0, F.expr(
        "CASE WHEN _s >= 0 THEN (2 * _s + _n) DIV (2 * _n) "
        "ELSE -((2 * -_s + _n) DIV (2 * _n)) END")).otherwise(F.col("_s"))
    return (df.select(F.col(id_col), n.alias("_n"), s.alias("_s"))
              .withColumn("_mean", mean.cast("long"))
              .select(F.col(id_col),
                      F.col("_n").alias("n_tokens"),
                      F.col("_s").alias("score_sum_micros"),
                      F.col("_mean").alias("score_mean_micros"),
                      (F.col("_mean") >= F.lit(int(threshold_micros)))
                      .alias("pass_quality")))


def probe_features(df: DataFrame, buckets: int = 32,
                   id_col: str = "doc_id", text_col: str = "text",
                   label_col: str = "label") -> DataFrame:
    """Hashed-unigram feature frame for the linear quality probe: one
    row per (document, active bucket) with the occurrence count, plus
    the document's token total and its label in micros. Buckets hash
    exactly as ``hashed_linear_score`` does (``md5_hash60(t) %
    buckets``), so weights trained here feed inference unchanged.

    Built with ONE scan + one map-side-combinable groupBy; persist the
    result when iterating — every GD round reuses it. ``fan_out``
    spreads single-split inputs before the tokenize+explode (the
    map-heavy stage must parallelize regardless of file layout).
    """
    from ..parallel import fan_out
    from .text import tokens

    df = fan_out(df)
    toks = tokens(F.col(text_col))
    return (df.select(F.col(id_col),
                      F.size(toks).cast("long").alias("n_tokens"),
                      (F.col(label_col).cast("long") * 1_000_000)
                      .alias("y_micros"),
                      F.explode(toks).alias("_t"))
            .withColumn("bucket",
                        (md5_hash60(F.col("_t")) % buckets).cast("int"))
            .groupBy(id_col, "n_tokens", "y_micros", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def linear_probe_step(feat: DataFrame, weights: dict[int, int],
                      buckets: int = 32, lr_ppm: int = 200_000,
                      id_col: str = "doc_id") -> DataFrame:
    """ONE full-batch gradient-descent round for the linear
    quality-classifier probe — the TRAINING step whose fixed point
    ``hashed_linear_score`` consumes (the CCNet/GPT-3 pipelines train
    such a filter on curated-positive vs crawl-negative labels; Wenzek
    et al. 2020, Brown et al. 2020 Appendix A). Same external-driver-
    loop idiom as ``similarity.kmeans_step`` and PageRank: the model
    state (``buckets`` weights, micros) rides in as a plain dict and
    the updated state comes back as a ``buckets``-row DataFrame —
    driver traffic is model-sized, never data-sized.

    Exact-integer semantics, replayed bit-for-bit by the oracle:

        p_d   = divhalf(sum_b c_db * w_b, n_d)          (mean score)
        g_b   = sum_d divhalf((p_d - y_d) * c_db, n_d)  (grad, micros)
        w_b'  = w_b - divhalf(lr_ppm * g_b, 1_000_000 * N)

    with divhalf = half-away-from-zero division (the sign-split DIV
    shared with ``hashed_linear_score``) and N = number of documents.
    Squared-loss linear probe, not a sigmoid: log-free, so both
    engines agree exactly.

    Scale shape: round = one groupBy(doc) over the feature frame + one
    join back + one groupBy(bucket) — two uniformly-hashed shuffles of
    the SPARSE feature frame, nothing quadratic; production trains on
    a held-out sample, then scores the full corpus map-side.
    """
    # half-away-from-zero DIV over named long columns (the
    # hashed_linear_score idiom — pyspark Columns have no exact
    # integer division operator, and double division loses bits past
    # 2^53, which lr_ppm * grad products reach)
    def divhalf(a: str, b: str) -> str:
        return (f"CASE WHEN {a} >= 0 THEN (2 * {a} + {b}) DIV (2 * {b})"
                f" ELSE -((2 * -{a} + {b}) DIV (2 * {b})) END")

    wmap = F.create_map(*[F.lit(x) for b in sorted(weights)
                          for x in (b, int(weights[b]))])
    wcol = F.coalesce(F.try_element_at(wmap, F.col("bucket")), F.lit(0))
    doc = (feat.withColumn("_wc", (F.col("cnt") * wcol).cast("long"))
           .groupBy(id_col, "n_tokens", "y_micros")
           .agg(F.sum("_wc").cast("long").alias("_s"))
           .withColumn("_r", F.expr(divhalf("_s", "n_tokens"))
                       - F.col("y_micros"))
           .select(id_col, "_r"))
    n_docs = feat.select(id_col).distinct().count()
    grad = (feat.join(doc, id_col)
            .withColumn("_rc", (F.col("_r") * F.col("cnt")).cast("long"))
            .withColumn("_g", F.expr(divhalf("_rc", "n_tokens")))
            .groupBy("bucket").agg(F.sum("_g").cast("long").alias("_gs")))
    spark = feat.sparkSession
    allb = spark.range(buckets).select(F.col("id").cast("int").alias("bucket"))
    return (allb.join(grad, "bucket", "left")
            .withColumn("_lg", F.lit(int(lr_ppm))
                        * F.coalesce("_gs", F.lit(0)))
            .withColumn("_nd", F.lit(1_000_000 * int(n_docs)))
            .select("bucket",
                    (wcol - F.expr(divhalf("_lg", "_nd")))
                    .cast("long").alias("w_micros")))


def linear_probe_train(df: DataFrame, rounds: int = 3, buckets: int = 32,
                       lr_ppm: int = 200_000, id_col: str = "doc_id",
                       text_col: str = "text",
                       label_col: str = "label") -> dict[int, int]:
    """N GD rounds of ``linear_probe_step`` from zero weights; returns
    the trained weight dict for ``hashed_linear_score``. The feature
    frame is built ONCE and persisted across rounds (the
    ``kmeans_train_assign`` pattern); per-round driver traffic is the
    ``buckets``-row weight table."""
    feat = tracked_persist(probe_features(df, buckets, id_col,
                                          text_col, label_col))
    w = {b: 0 for b in range(buckets)}
    for _ in range(rounds):
        rows = linear_probe_step(feat, w, buckets, lr_ppm,
                                 id_col).collect()
        w = {r["bucket"]: r["w_micros"] for r in rows}
    return w
