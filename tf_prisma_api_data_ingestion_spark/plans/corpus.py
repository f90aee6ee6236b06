"""End-to-end LLM training-data cleaning pipeline (north-star flagship):
the composition a 100 TB corpus actually runs, built entirely from this
repo's operators —

    quality filter -> exact dedup -> near-dup clustering -> keep-list

Stage ordering is the scale story: the cheap quality filter (pure
row-local expressions, fully pushdown-friendly) prunes the corpus BEFORE
the expensive shingle inverted-index join; exact dedup (one hash groupBy)
removes byte-identical copies before near-dup pairing; only then does the
quadratic-free jaccard machinery run, over the smallest possible set.
Every stage is a DataFrame -> DataFrame operator reused from
operators/{text,dedup}.py, and the whole pipeline is replayed by a single
DuckDB oracle (recursive CTE for the cluster reachability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from ..cache import tracked_persist
from ..parallel import fan_out
from ..operators.dedup import dedup_clusters_auto, ngram_jaccard_pairs
from ..operators.text import quality_features


def _exact_dedup_min_id(df: DataFrame) -> DataFrame:
    """Keep the min-doc_id representative of each exact content class
    (md5 of text) in ONE pass: row_number over the hash. Value-identical
    to groupBy(hash).agg(min(doc_id)) + join back, but the upstream plan
    is evaluated once instead of twice and there is no second join
    shuffle. Scale shape: one hash shuffle; the per-hash partition is the
    duplicate class (tiny), sorted in the spillable window buffer."""
    from pyspark.sql.window import Window
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def corpus_clean(spark: SparkSession, sf_dir: str,
                 min_quality: float = 0.5, min_tokens: int = 10,
                 jaccard_threshold: float = 0.5,
                 max_df: int = 1000) -> DataFrame:
    """Returns the kept documents as (doc_id, n_tokens, quality_score).

    Keep rule: the minimum doc_id of each near-dup cluster (clusters from
    connected components over exact-jaccard >= threshold pairs), computed
    over quality-passing, exact-deduped documents.
    """
    # fan_out BEFORE the regex-heavy feature pass: parquet splits by
    # bytes but a row group is indivisible, so a few-row-group corpus
    # file scans as few partitions and the quality/shingle CPU
    # serializes onto them (measured: one 500k-row group -> one core)
    d = fan_out(tables.load(spark, sf_dir, "documents"))
    q = (quality_features(d, "text")
         .filter((F.col("quality_score") >= min_quality)
                 & (F.col("n_tokens") >= min_tokens)))
    # exact dedup: one representative (min id) per content hash, as a
    # row_number window over the hash — ONE pass over q. The earlier
    # groupBy + self-join formulation evaluated the quality chain twice
    # (once under the agg, once as the join's left side) because q is
    # unpersisted here by design; the window needs q exactly once and
    # shuffles on the hash either way (measured ~2.5 s off at sf0.1)
    docs = tracked_persist(_exact_dedup_min_id(q))
    # persist: docs feeds the shingle pairing, the cluster node set, AND
    # the final keep join — without the barrier the quality regexes and
    # dedup window re-run once per consumer (measured ~20 s -> ~8 s at
    # sf0.1 with the cache)
    # max_df: the pair machinery's skew guard, ON in the plans (oracle
    # replays the identical cap). max_df=None at sf10 put a hot
    # shingle's entire postings-square into ONE join partition -- the
    # measured single-straggler stall no partition count can fix.
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=jaccard_threshold,
                                max_df=max_df)
    # auto-selected CC: min-label propagation on small edge sets (fast
    # constants on shallow graphs), large-star/small-star (O(log n)
    # bounded rounds) past 100k edges — the sf10 regime where the
    # propagation loop ran tens of minutes of sequential jobs
    clusters = dedup_clusters_auto(pairs.select("doc_a", "doc_b"),
                                   docs.select("doc_id"))
    keep = (clusters.groupBy("cluster_id")
                    .agg(F.min("doc_id").alias("doc_id"))
                    .select("doc_id"))
    return docs.join(keep, "doc_id").select("doc_id", "n_tokens",
                                            "quality_score")


def _clean_v2_survivor_rows(spark: SparkSession, sf_dir: str,
                            min_quality: float = 0.5, min_tokens: int = 10,
                            max_dup_frac: float = 0.5,
                            jaccard_threshold: float = 0.5,
                            bench_mod: int = 100,
                            max_df: int = 1000) -> DataFrame:
    """The full modern pre-training filter chain: quality -> repetition
    -> benchmark decontamination -> exact dedup -> near-dup keep-list.

    Same stage-ordering logic as ``corpus_clean`` — every row-local
    filter (quality regexes, repeated-3-gram fraction) and the
    broadcast-bank contamination check run BEFORE the expensive shingle
    inverted-index join, so the pair machinery sees the smallest possible
    corpus. Benchmark docs (doc_id % bench_mod == 0) are held out of the
    output entirely. Returns the surviving documents' FULL rows (source
    columns plus the feature columns) so downstream stages
    (``corpus_to_training``) reuse the persisted survivor set instead of
    re-scanning and re-joining the corpus; ``corpus_clean_v2`` is the
    report projection over it.
    """
    from ..operators.text import contamination_hits, dup_ngram_frac

    # fan_out BEFORE the regex-heavy feature pass: parquet splits by
    # bytes but a row group is indivisible, so a few-row-group corpus
    # file scans as few partitions and the quality/shingle CPU
    # serializes onto them (measured: one 500k-row group -> one core)
    d = fan_out(tables.load(spark, sf_dir, "documents"))
    # ONE pass for every row-local feature: quality AND the repetition
    # fraction are columns of the same select, so the corpus is scanned
    # and tokenized once for both (a per-feature DataFrame + doc_id join
    # would re-scan and shuffle per feature). The featured frame is
    # PERSISTED and shared with the contamination check (r15, guide
    # §2.4/§6): before, quality and contamination each re-scanned the
    # documents parquet — 4 scan subtrees in the plan (quality chain,
    # contamination grams, bank, id spine); now the corpus is read once
    # and every consumer reads the cache.
    feat = tracked_persist(
        quality_features(d, "text")
        .withColumn("dup_frac", dup_ngram_frac(F.col("text"), 3)))
    q = feat.filter((F.col("quality_score") >= min_quality)
                    & (F.col("n_tokens") >= min_tokens)
                    & (F.col("dup_frac") <= max_dup_frac))
    # contamination gram explode over the QUALITY SURVIVORS only: the
    # final survivor set is base = q ⋈ clean_ids, and a doc's hit count
    # depends only on its own text and the bank, so restricting the
    # checked corpus to q (a superset of the output) is value-identical
    # and cuts the 5-gram explode+join to the surviving fraction. The
    # bank still draws from ALL benchmark docs via the shared persisted
    # frame (a quality-failing eval doc must still decontaminate —
    # oracle: bank is unconditional on quality).
    clean_ids = (contamination_hits(q, n=5, bench_mod=bench_mod,
                                    bank_df=feat)
                 .filter(~F.col("contaminated"))
                 .select("doc_id"))
    # quality_features preserves source columns, so base still carries
    # text for the md5 dedup key and the shingle pairing
    base = q.join(clean_ids, "doc_id")
    # min-id-per-hash via row_number window: one pass over base (the
    # groupBy + self-join twin re-evaluated the whole quality/repetition/
    # contamination chain twice — see corpus_clean)
    docs = tracked_persist(_exact_dedup_min_id(base))
    # max_df: the pair machinery's skew guard, ON in the plans (oracle
    # replays the identical cap). max_df=None at sf10 put a hot
    # shingle's entire postings-square into ONE join partition -- the
    # measured single-straggler stall no partition count can fix.
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=jaccard_threshold,
                                max_df=max_df)
    # auto-selected CC for the same reason as corpus_clean
    clusters = dedup_clusters_auto(pairs.select("doc_a", "doc_b"),
                                   docs.select("doc_id"))
    keep = (clusters.groupBy("cluster_id")
                    .agg(F.min("doc_id").alias("doc_id"))
                    .select("doc_id"))
    return docs.join(keep, "doc_id")


def corpus_clean_v2(spark: SparkSession, sf_dir: str,
                    **kwargs) -> DataFrame:
    """Report projection of :func:`_clean_v2_survivor_rows` — the
    public (doc_id, n_tokens, quality_score, dup_frac) contract."""
    return _clean_v2_survivor_rows(spark, sf_dir, **kwargs).select(
        "doc_id", "n_tokens", "quality_score", "dup_frac")


def corpus_to_training(spark: SparkSession, sf_dir: str,
                       budget: int = 512,
                       sample_budget: float = 150.0,
                       **clean_kwargs) -> DataFrame:
    """The COMPLETE training-data pipeline, cleaned corpus to packed
    training bins:

        corpus_clean_v2 (quality -> repetition -> decontamination ->
        exact dedup -> near-dup keep-list)
          -> temperature sampling (alpha=0.5 source rebalancing,
             deterministic md5 keep-threshold — no RNG)
          -> fixed-token sequence packing (per-shard running sum,
             ``budget`` tokens per bin)

    Returns (doc_id, source, n_tokens, bin_id, bin_offset) — the layout a
    trainer's data loader consumes. Stage ordering is the scale story
    extended one level: sampling runs AFTER near-dup removal (sampling
    first would let surviving duplicates distort the source statistics)
    and BEFORE packing (bins must be contiguous over the final doc set).
    Every stage is deterministic, so the whole five-stage composition is
    replayed by one DuckDB oracle.
    """
    from ..operators.text import pack_sequences, temperature_sample

    # the survivor rows come straight out of the clean chain's persisted
    # frame (they already carry doc_id/source/text) — the r13 form
    # re-scanned the documents table and re-joined it against the
    # survivor ids, paying one extra corpus scan + join for columns the
    # clean chain already held (guide §2.4). Persist: the sampler's
    # per-source counts, the sampler's keep join, and the packer all
    # consume this frame.
    docs = tracked_persist(
        _clean_v2_survivor_rows(spark, sf_dir, **clean_kwargs))
    # per-source sqrt rates over the SURVIVORS (one shared operator with
    # text-temperature-sample — decimal-quantized Z, order-free, exact)
    sampled = temperature_sample(docs, budget=sample_budget)
    return pack_sequences(sampled, budget=budget)


def mixture_rebalance(df: DataFrame, stratum_col: str,
                      targets: dict[str, int]) -> DataFrame:
    """Rebalance a corpus to target stratum proportions (the data-mixing
    step every LLM training run performs: "20% per language", "60% web /
    30% code / 10% books") via deterministic hash-threshold sampling —
    and report what the rebalance achieved.

    ``targets`` maps stratum value -> share in MICROS (must sum to
    1e6 over the strata you care about). The plan computes the largest
    total budget B the corpus supports at those proportions
    (B = min over strata of count_s * 1e6 / m_s, all integer), the
    per-stratum keep target want_s = m_s * B / 1e6, then keeps a row iff

        hash60(doc_id) * count_s  <  2^60 * want_s

    — a pure per-row comparison in DECIMAL(38,0) (HUGEINT in the
    oracle), so selection is exact integer arithmetic, reproducible
    from doc_id alone, and requires NO shuffle of the data: the only
    data-sized operations are two map-side-combinable count
    aggregations (per-stratum totals, then per-stratum kept counts).
    No window over the corpus, no global sort — the rank-based
    alternative would shuffle the entire corpus into |strata|
    partitions, the classic skew trap at 100 TB. Hash thresholding
    trades exact per-stratum counts for binomial-noise counts
    (realized_micro reports the achieved mix honestly).

    Strata missing from ``targets`` (or targets absent from the data)
    are dropped — inner-join contract, stated here.

    Returns one row per stratum: (stratum, n_total, n_target, n_kept,
    target_micro, realized_micro).
    """
    from ..operators.dedup import md5_hash60
    t = F.create_map(*[F.lit(x) for kv in targets.items() for x in kv])
    counts = (df.groupBy(F.col(stratum_col).alias("stratum"))
                .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("_c"))
                .withColumn("_m", t[F.col("stratum")]
                            .cast("decimal(38,0)"))
                .filter(F.col("_m").isNotNull()))
    budget = counts.agg(
        F.min(F.expr("_c * 1000000 DIV _m")).alias("_B"))
    plan = tracked_persist(
        counts.crossJoin(F.broadcast(budget))
              .withColumn("_want", F.expr("_m * _B DIV 1000000"))
              .select("stratum", "_c", "_m", "_want"))
    marked = df.join(
        F.broadcast(plan),
        df[stratum_col] == plan["stratum"]).withColumn(
        "_keep",
        md5_hash60(F.col("doc_id").cast("string")).cast("decimal(38,0)")
        * F.col("_c")
        < F.lit(2 ** 60).cast("decimal(38,0)") * F.col("_want"))
    kept = (marked.groupBy("stratum")
                  .agg(F.sum(F.when(F.col("_keep"), 1).otherwise(0))
                        .cast("decimal(38,0)").alias("_kept")))
    total = kept.agg(F.sum("_kept").alias("_tk"))
    return (plan.join(kept, "stratum", "left")
                .crossJoin(F.broadcast(total))
                .select(
                    "stratum",
                    F.col("_c").cast("long").alias("n_total"),
                    F.col("_want").cast("long").alias("n_target"),
                    F.coalesce(F.col("_kept"), F.lit(0)
                               .cast("decimal(38,0)"))
                     .cast("long").alias("n_kept"),
                    F.col("_m").cast("int").alias("target_micro"),
                    F.expr("CAST(coalesce(_kept, CAST(0 AS DECIMAL(38,0)))"
                           " * 1000000 DIV _tk AS BIGINT)")
                     .alias("realized_micro")))


def curation_report(docs: DataFrame) -> DataFrame:
    """Corpus-intake curation funnel: Gopher rule gates -> DSIR
    importance vs the English subset -> threshold selection -> one
    per-(source, lang) report row — the table a data-curation review
    actually reads (how much of each incoming source survives the cheap
    gates, and how much of THAT looks like the target domain).

    Selection rule: pass_gopher AND imp_ppm >= 1e6 (importance ratio
    >= 1: the doc is more target-like than source-average). Documents
    with no bigrams carry no importance score and are never selected.

    Scale shape: the Gopher flags are computed IN the base projection
    (gopher_rules(keep=...) — zero extra pass, zero join); the only
    corpus-sized shuffle is DSIR's own (doc, bucket) aggregation plus
    the doc_id equi-join of two already-reduced frames; the report agg
    is map-side-combinable with |sources| x |langs| output rows.
    """
    from ..operators.selection import dsir_importance
    from ..operators.text import gopher_rules

    flags = gopher_rules(docs, keep=("source", "lang"))
    imp = dsir_importance(docs, docs.filter(F.col("lang") == "en"),
                          buckets=4096).select("doc_id", "imp_ppm")
    j = flags.join(imp, "doc_id", "left")
    sel = (F.col("pass_gopher")
           & (F.coalesce(F.col("imp_ppm"), F.lit(0)) >= 1000000))
    return (j.groupBy("source", "lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.when(F.col("pass_gopher"), 1).otherwise(0))
                   .cast("long").alias("n_pass_gopher"),
                  F.sum(F.when(sel, 1).otherwise(0))
                   .cast("long").alias("n_selected"),
                  F.sum(F.when(sel, F.col("n_words")).otherwise(0))
                   .cast("long").alias("tok_selected")))


def semdedup_clean(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Sequential lexical + semantic cleaning funnel — the modern
    curation pipeline shape (rule gates, then exact dedup, then SemDeDup
    over the survivors' embeddings), reported per (source, lang) so a
    review sees WHERE each source's volume dies:

        n_docs -> n_gopher (rule gates) -> n_exact (content dedup)
               -> n_final (semantic dedup)

    Stage composition is genuinely sequential: the exact-dedup window
    runs only over gopher passers, and the SemDeDup quantizer's
    centroids are fitted on the SURVIVORS' embeddings (deduping the raw
    table would let rejected boilerplate pull the centroids).

    Scale shape: gopher flags ride the base projection (zero extra
    pass); exact dedup is the one-pass window over the content hash;
    SemDeDup sees only the filtered embedding set (semi-join on the
    survivor ids); the three report aggregations are all map-side
    combinable with |sources| x |langs| rows out.
    """
    from ..operators.similarity import semdedup
    from ..operators.text import gopher_rules

    flags = tracked_persist(
        gopher_rules(docs, keep=("source", "lang", "text")))
    s1 = tracked_persist(
        _exact_dedup_min_id(flags.filter(F.col("pass_gopher")))
        .select("doc_id", "source", "lang"))
    emb_f = embeddings.join(
        s1.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
    kept = (semdedup(emb_f).filter(F.col("kept"))
            .select(F.col("vec_id").alias("doc_id")))
    base = (flags.groupBy("source", "lang")
                 .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                      F.sum(F.when(F.col("pass_gopher"), 1).otherwise(0))
                       .cast("long").alias("n_gopher")))
    ex = (s1.groupBy("source", "lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_exact")))
    fin = (s1.join(kept, "doc_id", "left_semi")
             .groupBy("source", "lang")
             .agg(F.count(F.lit(1)).cast("long").alias("n_final")))
    return (base.join(ex, ["source", "lang"], "left")
                .join(fin, ["source", "lang"], "left")
                .fillna({"n_exact": 0, "n_final": 0}))


def kmeans_semdedup(embeddings: DataFrame, iters: int = 2,
                    tau_num: int = 17, tau_den: int = 20) -> DataFrame:
    """The full trained-quantizer SemDeDup story, end to end: TRAIN the
    coarse quantizer with ``iters`` Lloyd rounds (seeded from the label
    column), RELABEL the corpus with the trained assignment, then run
    SemDeDup's within-cluster exact-cosine dedup against the TRAINED
    clustering. Closes the loop the standalone keys leave open —
    sim-kmeans-step verifies one training round and sim-semdedup
    dedups against the raw labels; production dedups against a
    converged quantizer, which tightens clusters and therefore catches
    near-dups the seed labels split across clusters.

    Scale shape: iters x (centroid agg + assignment pass) for training
    (K x dim driver state per round), then SemDeDup's sum(|cluster|^2)
    pair stage — nothing here exceeds the parts' own budgets; the only
    new frame is the (vec_id, cluster) relabel join. Exact integer
    throughout, so the oracle replays train + assign + dedup unrolled.
    Returns (vec_id, cluster, kept).
    """
    from ..operators.similarity import kmeans_train_assign, semdedup

    trained = kmeans_train_assign(embeddings, iters=iters)
    relabeled = (embeddings.drop("label")
                 .join(trained.select("vec_id",
                                      F.col("cluster").alias("label")),
                       "vec_id"))
    return semdedup(relabeled, tau_num, tau_den)
