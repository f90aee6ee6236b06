"""r7 one-off (VERDICT r6 #8): decade rows for the two r6-new streaming
keys — stream-trending-topk and stream-drift — at sf0.1 vs sf1eq
(events x10). Bench protocol: warm drain at sf0.001 immediately before
each timed drain, two timed passes, min."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1eq", "/tmp/sf1eq")]
KEYS = ["stream-trending-topk", "stream-drift"]


def main() -> None:
    spark = get_spark("r7stream")
    for key in KEYS:
        fn = QUERIES[key]
        for label, d in SCALES:
            fn(spark, "/root/testdata/sf0.001").count()
            cache.release_all(blocking=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, d).count()
                best = min(best, time.time() - t0)
                cache.release_all(blocking=True)
            print(f"RES {key} {label} {best:.2f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
