"""r9 one-off: decade rows for the round's new keys on the documents
axis (x1 = sf0.1 5k docs, x10 = sf1eq 50k, x100 = sf10docs 500k).
Protocol: warm at sf0.001, min-of-2 per decade, single pass at the top
(v2 protocol, full materialization)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.actions import materialize  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

KEYS = ("dedup-substring", "op-bpe-merge-step", "plan-bpe-train",
        "text-quality-classifier", "text-c4-badwords")
SCALES = [("sf0.1", "/root/testdata/sf0.1", 2),
          ("sf1eq", "/tmp/sf1eq", 2),
          ("sf10docs", "/tmp/sf10docs", 1)]


def main() -> None:
    spark = get_spark("r9newkeys")
    for key in KEYS:
        fn = QUERIES[key]
        for label, d, passes in SCALES:
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
