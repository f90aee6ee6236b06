"""Round-15: same-session interleaved A/Bs for the two structural
changes of the round —

1. corpus-train shared featured frame: A = the r14
   ``_clean_v2_survivor_rows`` body (quality chain and contamination
   each re-scan documents; contamination grams over ALL non-bench
   docs), B = the committed r15 form (one persisted featured frame
   shared by quality, contamination grams, bank and spine; gram explode
   over quality survivors only).
2. ivf query-side slim-vec reuse: A = the r14 ``ivf_topk`` (query
   ``ivf_assign`` re-derives its slim frame per consumer), B = the
   committed form (persisted ``qvecs`` threaded through).

Protocol: row-identity asserted before timing, identical noop
materialization, alternating A/B passes (both sides hit the same
ambient noise), min-of-3 per side, canary-bracketed.

Usage: python scripts/r15_ab.py [corpus|ivf ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    which = set(sys.argv[1:]) or {"corpus", "ivf"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.cache import tracked_persist
    from tf_prisma_api_data_ingestion_spark.operators import similarity as S
    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        dedup_clusters_auto, ngram_jaccard_pairs)
    from tf_prisma_api_data_ingestion_spark.operators.relational import (
        top_k_per_group)
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        contamination_hits, dup_ngram_frac, pack_sequences,
        quality_features, temperature_sample)
    from tf_prisma_api_data_ingestion_spark.parallel import fan_out
    from tf_prisma_api_data_ingestion_spark.plans.corpus import (
        _exact_dedup_min_id)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r15_ab")
    for t in tables.TABLE_NAMES:
        tables.load(spark, sf_dir, t).count()

    def canary() -> float:
        df = (spark.range(0, 50_000_000, 1, 32)
              .selectExpr("sum(pmod(xxhash64(id), 1000000)) AS s"))
        for _ in range(4):
            materialize(df)
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            materialize(df)
            best = min(best, time.time() - t0)
        return round(best, 3)

    def survivors_r14():
        # the r14 _clean_v2_survivor_rows body, verbatim
        d = fan_out(tables.load(spark, sf_dir, "documents"))
        q = (quality_features(d, "text")
             .withColumn("dup_frac", dup_ngram_frac(F.col("text"), 3))
             .filter((F.col("quality_score") >= 0.5)
                     & (F.col("n_tokens") >= 10)
                     & (F.col("dup_frac") <= 0.5)))
        clean_ids = (contamination_hits(d, n=5, bench_mod=100)
                     .filter(~F.col("contaminated"))
                     .select("doc_id"))
        base = q.join(clean_ids, "doc_id")
        docs = tracked_persist(_exact_dedup_min_id(base))
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=1000)
        clusters = dedup_clusters_auto(pairs.select("doc_a", "doc_b"),
                                       docs.select("doc_id"))
        keep = (clusters.groupBy("cluster_id")
                        .agg(F.min("doc_id").alias("doc_id"))
                        .select("doc_id"))
        return docs.join(keep, "doc_id")

    def train_a():
        docs = tracked_persist(survivors_r14())
        return pack_sequences(temperature_sample(docs, budget=150.0),
                              budget=512)

    def train_b():
        from tf_prisma_api_data_ingestion_spark.plans.corpus import (
            corpus_to_training)
        return corpus_to_training(spark, sf_dir, budget=512,
                                  sample_budget=150.0)

    e = tables.load(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") < 5)

    def ivf_a():
        # the r14 ivf_topk body (no query-side shared frame)
        vecs = tracked_persist(S._slim_vecs(e, "vec_id", "embedding"))
        cents = tracked_persist(S.ivf_centroids(e, nc=16, iters=1,
                                                vecs=vecs))
        cand = S.ivf_assign(e, cents, nprobe=1, vecs=vecs)
        qa = (S.ivf_assign(qv, cents, nprobe=4)
              .select(F.col("vec_id").alias("query_id"), "cid",
                      F.col("_v").alias("_qv"), F.col("_n").alias("_qn")))
        joined = (cand.join(F.broadcast(qa), "cid")
                  .filter(F.col("vec_id") != F.col("query_id"))
                  .withColumn("cos", S.dot(F.col("_qv"), F.col("_v"))
                              / (F.col("_qn") * F.col("_n"))))
        top = top_k_per_group(joined, ["query_id"], "cos", 10,
                              descending=True, tiebreak=["vec_id"])
        return top.select("query_id", "vec_id",
                          F.round("cos", 4).alias("cos_r"))

    def ivf_b():
        return S.ivf_topk(qv, e, k=10, nc=16, nprobe=4, iters=1)

    pairs = []
    if "corpus" in which:
        pairs.append(("corpus-train", train_a, train_b))
    if "ivf" in which:
        pairs.append(("sim-ivf-topk", ivf_a, ivf_b))

    for name, build_a, build_b in pairs:
        a_rows = sorted(map(tuple, build_a().collect()))
        cache.release_all(blocking=True)
        b_rows = sorted(map(tuple, build_b().collect()))
        cache.release_all(blocking=True)
        assert a_rows == b_rows, f"{name}: A/B diverged — abort timing"
        print(f"{name} IDENTITY ok: {len(a_rows)} rows equal", flush=True)

        for build in (build_a, build_b):
            materialize(build())
            cache.release_all(blocking=True)

        c0 = canary()
        walls = {"A": [], "B": []}
        for _ in range(3):
            for side, build in (("A", build_a), ("B", build_b)):
                t0 = time.time()
                materialize(build())
                walls[side].append(round(time.time() - t0, 3))
                cache.release_all(blocking=True)
        c1 = canary()
        print(f"{name} canary {c0} / {c1}  (ref 0.13)", flush=True)
        print(f"{name} A (r14 form): {walls['A']} min={min(walls['A'])}",
              flush=True)
        print(f"{name} B (r15 form): {walls['B']} min={min(walls['B'])}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
