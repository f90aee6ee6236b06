"""r14 one-off: canary-bracketed min-of-3 re-measurement of
dedup-containment (the r13 verdict's only WEAK mark: driver bench wall
3.01s vs the 1.56 SCALING_SF01 reference, 1.93x, with no code change
touching the operator) plus the three keys the same r13 run drifted
+25-50% on with a healthy canary (text-lm-likelihood, op-pagerank,
plan-feature-store) — the r13 asof-join adjudication protocol: if a
canary-healthy min-of-3 reads stable near the recorded wall, the r13
number was ambient; if it reads stably elevated, the WALL is stale and
gets refreshed (SCALING r13 §7).

Usage: python scripts/r14_remeasure.py  (writes /tmp/r14_remeasure.log)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

LOG = "/tmp/r14_remeasure.log"
KEYS = ["dedup-containment", "text-lm-likelihood", "op-pagerank",
        "plan-feature-store"]
SF_DIR = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"


def log(msg: str) -> None:
    with open(LOG, "a") as f:
        f.write(msg + "\n")
    print(msg, flush=True)


def canary(spark, materialize) -> float:
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


def main() -> None:
    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_remeasure")
    for t in tables.TABLE_NAMES:
        tables.load(spark, SF_DIR, t).count()
    c0 = canary(spark, materialize)
    log(f"# canary start {c0} (ref 0.13)")
    for name in KEYS:
        fn = QUERIES[name]
        materialize(fn(spark, WARM))  # JIT warm, same action shape
        cache.release_all(blocking=True)
        walls = []
        for _ in range(3):
            t0 = time.time()
            materialize(fn(spark, SF_DIR))
            walls.append(round(time.time() - t0, 3))
            cache.release_all(blocking=True)
        log(f"{name}: min {min(walls)} of {walls}")
    c1 = canary(spark, materialize)
    log(f"# canary end {c1} (ref 0.13)")
    spark.stop()


if __name__ == "__main__":
    main()
