"""Round-14 second pass: scale evidence for the two structural changes.

1. exact_global_rank adaptive buckets: over parquet frames of 5M and
   50M rows, record the bucket count the derivation picks at the
   production dial (SPARK_GRAFT_RANK_BUCKET_BYTES) vs the floor, the
   wall at each, and exactness (max rank == n and the per-bucket
   offsets compose — checked via count(distinct rank) == n). The 4 MB
   dial emulates the 100 TB regime (input >> floor x target) at local
   size; the mechanism exercised is identical.
2. ivf_topk shared vector frame: interleaved A/B (r13 re-derive form vs
   shared persisted frame) at a 10x copy-shifted embeddings corpus —
   the decade where the two saved corpus passes should be visible above
   noise. Identity asserted before timing.

Results land in SCALING-style rows printed with an OUT prefix.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.cache import tracked_persist
    from tf_prisma_api_data_ingestion_spark.operators import similarity as S
    from tf_prisma_api_data_ingestion_spark.operators.rank import (
        _adaptive_buckets, exact_global_rank)
    from tf_prisma_api_data_ingestion_spark.operators.relational import (
        top_k_per_group)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_scale")

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

    print(f"OUT canary start: {canary()}", flush=True)

    # ---- 1. adaptive rank buckets at 5M / 50M rows -------------------
    base = "/tmp/r14_rank_scale"
    for n in (5_000_000, 50_000_000):
        p = f"{base}/nums_{n}.parquet"
        if not os.path.exists(p):
            (spark.range(0, n, 1, 32)
             .select(F.col("id"),
                     F.pmod(F.xxhash64("id"), F.lit(10_000_019))
                     .cast("double").alias("v"))
             .write.mode("overwrite").parquet(p))
        df = spark.read.parquet(p)
        for label, env in (("floor", None), ("adaptive-4m", "4194304")):
            if env is None:
                os.environ.pop("SPARK_GRAFT_RANK_BUCKET_BYTES", None)
            else:
                os.environ["SPARK_GRAFT_RANK_BUCKET_BYTES"] = env
            nb = _adaptive_buckets(df)
            r = exact_global_rank(df, "v", tiebreak=["id"], out="r")
            walls = []
            for _ in range(2):
                t0 = time.time()
                materialize(r)
                walls.append(round(time.time() - t0, 3))
            chk = r.agg(F.max("r").alias("mx"),
                        F.countDistinct("r").alias("d"),
                        F.count(F.lit(1)).alias("n")).first()
            ok = chk["mx"] == chk["n"] == chk["d"]
            print(f"OUT rank n={n} {label}: buckets={nb} walls={walls} "
                  f"min={min(walls)} exact={ok}", flush=True)
        os.environ.pop("SPARK_GRAFT_RANK_BUCKET_BYTES", None)

    # ---- 2. IVF A/B at 10x embeddings --------------------------------
    emb_dir = "/tmp/r14_emb10x"
    p = f"{emb_dir}/embeddings.parquet"
    if not os.path.exists(p):
        e1 = tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        shift = e1.agg(F.max("vec_id")).first()[0] + 1
        copies = [e1.select((F.col("vec_id") + F.lit(i * shift))
                            .alias("vec_id"), "embedding")
                  for i in range(10)]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(p)
    e = spark.read.parquet(p)
    q = e.filter(F.col("vec_id") < 5)
    n_e = e.count()
    print(f"OUT embeddings 10x rows: {n_e}", flush=True)

    def before_form():
        cents = tracked_persist(S.ivf_centroids(e, nc=8, iters=1))
        cand = S.ivf_assign(e, cents, nprobe=1)
        qa = (S.ivf_assign(q, cents, nprobe=8)
              .select(F.col("vec_id").alias("query_id"), "cid",
                      F.col("_v").alias("_qv"), F.col("_n").alias("_qn")))
        joined = (cand.join(F.broadcast(qa), "cid")
                  .filter(F.col("vec_id") != F.col("query_id"))
                  .withColumn("cos", S.dot(F.col("_qv"), F.col("_v"))
                              / (F.col("_qn") * F.col("_n"))))
        top = top_k_per_group(joined, ["query_id"], "cos", 5,
                              descending=True, tiebreak=["vec_id"])
        return top.select("query_id", "vec_id",
                          F.round("cos", 4).alias("cos_r"))

    def after_form():
        return S.ivf_topk(q, e, k=5, nc=8, nprobe=8, iters=1)

    ra = sorted(before_form().collect())
    cache.release_all(blocking=True)
    rb = sorted(after_form().collect())
    cache.release_all(blocking=True)
    assert ra == rb, "A/B diverged at 10x"
    print(f"OUT ivf identity at 10x: {len(ra)} rows equal", flush=True)
    for build in (before_form, after_form):
        materialize(build())
        cache.release_all(blocking=True)
    walls = {"A": [], "B": []}
    for _ in range(3):
        for name, build in (("A", before_form), ("B", after_form)):
            t0 = time.time()
            materialize(build())
            walls[name].append(round(time.time() - t0, 3))
            cache.release_all(blocking=True)
    print(f"OUT ivf 10x A (re-derive): {walls['A']} min={min(walls['A'])}",
          flush=True)
    print(f"OUT ivf 10x B (shared):    {walls['B']} min={min(walls['B'])}",
          flush=True)
    print(f"OUT canary end: {canary()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
