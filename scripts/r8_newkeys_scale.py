"""r8 one-off: decade rows for the round's new keys. plan-kmeans-train
runs on the embedding axis with the production cluster-count scaling
fixtures (clusters grow with the corpus: 500/10 -> 20k/100 -> 200k/1000,
the same regime the r7b SemDeDup rows use); op-train-split runs on the
documents axis. Protocol: warm at sf0.001, min-of-2 per decade (single
pass at the top), full materialization via actions.materialize."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.actions import materialize  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

PLANS = {
    "plan-kmeans-train": [("sf0.01", "/root/testdata/sf0.01", 2),
                          ("embx10sc", "/tmp/embx10sc", 2),
                          ("embx100sc", "/tmp/embx100sc", 1)],
    "op-train-split": [("sf0.1", "/root/testdata/sf0.1", 2),
                       ("sf1eq", "/tmp/sf1eq", 2),
                       ("sf10docs", "/tmp/sf10docs", 1)],
}


def main() -> None:
    spark = get_spark("r8newkeys")
    for key, scales in PLANS.items():
        fn = QUERIES[key]
        for label, d, passes in scales:
            materialize(fn(spark, "/root/testdata/sf0.001"))
            cache.release_all(blocking=True)
            best = float("inf")
            for _ in range(passes):
                t0 = time.time()
                materialize(fn(spark, d))
                best = min(best, time.time() - t0)
                cache.release_all(blocking=True)
            print(f"RES {key} {label} {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
