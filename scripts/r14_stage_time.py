"""Round-14: stage-level timing of plan-corpus-train and the graph keys.

Materializes each pipeline stage separately (noop sink) so the wall
decomposes; canary-bracketed so host degradation is visible. Each stage
is labeled via setJobDescription.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def canary(spark, materialize):
    df = (spark.range(0, 50_000_000, 1, 32)
              .selectExpr("sum(pmod(xxhash64(id), 1000000)) AS s"))
    for _ in range(2):
        materialize(df)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        materialize(df)
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        dedup_clusters_auto,
        ngram_jaccard_pairs,
    )
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        contamination_hits,
        dup_ngram_frac,
        pack_sequences,
        quality_features,
        temperature_sample,
    )
    from tf_prisma_api_data_ingestion_spark.parallel import fan_out
    from tf_prisma_api_data_ingestion_spark.plans.corpus import (
        _exact_dedup_min_id,
        corpus_clean_v2,
    )
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_stage_time")
    for t in tables.TABLE_NAMES:
        tables.load(spark, sf_dir, t).count()

    print(f"OUT canary_start {canary(spark, materialize):.3f}", flush=True)

    def stage(name, df_fn, reps=2):
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            materialize(df_fn())
            best = min(best, time.time() - t0)
            cache.release_all(blocking=True)
        print(f"OUT {name}\t{best:.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)
        return best

    d0 = fan_out(tables.load(spark, sf_dir, "documents"))

    # --- corpus-train decomposition -----------------------------------
    def mk_q():
        return (quality_features(d0, "text")
                .withColumn("dup_frac", dup_ngram_frac(F.col("text"), 3))
                .filter((F.col("quality_score") >= 0.5)
                        & (F.col("n_tokens") >= 10)
                        & (F.col("dup_frac") <= 0.5)))

    stage("ct1-quality-scan", mk_q)
    stage("ct2-contamination", lambda: contamination_hits(d0, n=5,
                                                          bench_mod=100))

    def mk_docs():
        q = mk_q()
        clean_ids = (contamination_hits(d0, n=5, bench_mod=100)
                     .filter(~F.col("contaminated")).select("doc_id"))
        return _exact_dedup_min_id(q.join(clean_ids, "doc_id"))

    stage("ct3-through-exact-dedup", mk_docs)

    def mk_pairs():
        docs = cache.tracked_persist(mk_docs())
        return ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=1000)

    stage("ct4-plus-pairs", mk_pairs)

    def mk_clusters():
        docs = cache.tracked_persist(mk_docs())
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=1000)
        return dedup_clusters_auto(pairs.select("doc_a", "doc_b"),
                                   docs.select("doc_id"))
    stage("ct5-plus-clusters", mk_clusters)

    def mk_clean():
        return corpus_clean_v2(spark, sf_dir)
    stage("ct6-clean-v2-full", mk_clean)

    def mk_full():
        kept = corpus_clean_v2(spark, sf_dir).select("doc_id")
        docs = cache.tracked_persist(d0.join(kept, "doc_id"))
        sampled = temperature_sample(docs, budget=150.0)
        return pack_sequences(sampled, budget=512)
    stage("ct7-full-train", mk_full)

    # --- graph decomposition ------------------------------------------
    from tf_prisma_api_data_ingestion_spark.catalog_registry import (
        _copurchase_edges,
    )

    stage("g1-copurchase-edges", lambda: _copurchase_edges(spark, sf_dir))

    def mk_pr_edges():
        o = tables.load(spark, sf_dir, "orders").select("o_orderkey",
                                                        "o_custkey")
        li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey",
                                                           "l_suppkey")
        cs = (o.join(li, o.o_orderkey == li.l_orderkey)
              .select(F.col("o_custkey").alias("c"),
                      (F.col("l_suppkey") + F.lit(10_000_000)).alias("s"))
              .distinct())
        return (cs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
                .unionByName(cs.select(F.col("s").alias("src"),
                                       F.col("c").alias("dst"))))

    stage("g2-pagerank-edgebuild", mk_pr_edges)

    def mk_pr_dedup():
        return mk_pr_edges().distinct()
    stage("g3-pagerank-edges-distinct", mk_pr_dedup)

    print(f"OUT canary_end {canary(spark, materialize):.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
