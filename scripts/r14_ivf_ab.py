"""Round-14: same-session interleaved A/B for the IVF shared-vector-frame
change (similarity._slim_vecs persisted once in ivf_topk).

A = the r13 form reconstructed inline (no shared frame: ivf_centroids and
each ivf_assign re-derive the slim (id, _v, _n) projection from the
corpus), B = the committed ivf_topk. Protocol: identical noop
materialization, alternating A/B passes (both sides hit the same ambient
noise), min-of-3 per side, canary-bracketed. Also asserts row-identity
A == B before timing, and writes plans/r14/sim-ivf-topk_after.txt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.cache import tracked_persist
    from tf_prisma_api_data_ingestion_spark.operators import similarity as S
    from tf_prisma_api_data_ingestion_spark.operators.relational import (
        top_k_per_group)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_ivf_ab")
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

    def before_form(queries, candidates, k, nc, nprobe, iters):
        # the r13 ivf_topk body, verbatim minus the shared-frame persist
        cents = tracked_persist(S.ivf_centroids(
            candidates, nc=nc, iters=iters))
        cand = S.ivf_assign(candidates, cents, nprobe=1)
        qa = (S.ivf_assign(queries, cents, nprobe=nprobe)
              .select(F.col("vec_id").alias("query_id"), "cid",
                      F.col("_v").alias("_qv"), F.col("_n").alias("_qn")))
        joined = (cand.join(F.broadcast(qa), "cid")
                  .filter(F.col("vec_id") != F.col("query_id"))
                  .withColumn("cos", S.dot(F.col("_qv"), F.col("_v"))
                              / (F.col("_qn") * F.col("_n"))))
        top = top_k_per_group(joined, ["query_id"], "cos", k,
                              descending=True, tiebreak=["vec_id"])
        return top.select("query_id", "vec_id",
                          F.round("cos", 4).alias("cos_r"))

    e = tables.load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)

    def build_a():
        return before_form(q, e, 5, 8, 8, 1)

    def build_b():
        return S.ivf_topk(q, e, k=5, nc=8, nprobe=8, iters=1)

    # identity first
    a_rows = sorted(build_a().collect())
    cache.release_all(blocking=True)
    b_rows = sorted(build_b().collect())
    cache.release_all(blocking=True)
    assert a_rows == b_rows, "A/B diverged — abort timing"
    print(f"IDENTITY ok: {len(a_rows)} rows equal", flush=True)

    # warm both codegen paths
    for build in (build_a, build_b):
        materialize(build())
        cache.release_all(blocking=True)

    c0 = canary()
    walls = {"A": [], "B": []}
    for _ in range(3):
        for name, build in (("A", build_a), ("B", build_b)):
            t0 = time.time()
            materialize(build())
            walls[name].append(round(time.time() - t0, 3))
            cache.release_all(blocking=True)
    c1 = canary()
    print(f"canary {c0} / {c1}  (ref 0.13)", flush=True)
    print(f"A (r13 form, re-derive per stage): {walls['A']} "
          f"min={min(walls['A'])}", flush=True)
    print(f"B (shared persisted frame):        {walls['B']} "
          f"min={min(walls['B'])}", flush=True)

    plan = build_b()._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        build_b()._jdf.queryExecution(), "formatted")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14",
        "sim-ivf-topk_after.txt")
    with open(out, "w") as fh:
        fh.write(plan)
    print(f"wrote {out} ({plan.count(chr(10))} lines)", flush=True)
    cache.release_all(blocking=True)
    spark.stop()


if __name__ == "__main__":
    main()
