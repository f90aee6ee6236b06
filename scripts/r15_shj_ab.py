"""Round-15: quantify the static SHJ gate separately from the AQE gate
(verdict r14 item 4) with a same-session interleaved A/B.

Both knobs are runtime SQL confs, so one session can alternate them
per pass — every variant hits the same ambient noise:

  A: preferSortMergeJoin=true,  AQE SHJ threshold 64m  (r15 default)
  B: preferSortMergeJoin=false, AQE SHJ threshold 64m  (r14 default)
  C: preferSortMergeJoin=true,  AQE SHJ threshold 0    (neither gate)

Keys: the three operators the r14 SHJ config was measured on.
Protocol: warm each (key, variant) once, then 3 interleaved rounds of
A/B/C, min per side, canary-bracketed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ["tpch-q5", "plan-provenance-report", "dedup-embedding-lsh"]
VARIANTS = {
    "A_smj_pref+aqe64m": ("true", str(64 << 20)),
    "B_shj_pref+aqe64m": ("false", str(64 << 20)),
    "C_smj_pref+aqe0": ("true", "0"),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r15_shj_ab")
    for t in tables.TABLE_NAMES:
        tables.load(spark, sf_dir, t).count()

    def set_variant(v):
        pref, thr = VARIANTS[v]
        spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", thr)

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

    print(f"canary_start {canary()}", flush=True)
    for key in KEYS:
        fn = QUERIES[key]
        walls: dict[str, list[float]] = {v: [] for v in VARIANTS}
        for v in VARIANTS:  # warm every variant's codegen
            set_variant(v)
            materialize(fn(spark, sf_dir))
            cache.release_all(blocking=True)
        for _ in range(3):
            for v in VARIANTS:
                set_variant(v)
                t0 = time.time()
                materialize(fn(spark, sf_dir))
                walls[v].append(round(time.time() - t0, 3))
                cache.release_all(blocking=True)
        for v, w in walls.items():
            print(f"{key}\t{v}\t{w}\tmin={min(w)}", flush=True)
    print(f"canary_end {canary()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
