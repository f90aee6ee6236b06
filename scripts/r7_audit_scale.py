"""r7 one-off: re-measure dedup-minhash-recall(+sampled) after the
truth-side swap to prefix_filter_jaccard_pairs (bench protocol: warm at
sf0.001 immediately before the timed query, two timed passes, min)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

SCALES = [("sf0.1", "/root/testdata/sf0.1"),
          ("sf1eq", "/tmp/sf1eq"),
          ("sf10docs", "/tmp/sf10docs")]
KEYS = ["dedup-minhash-recall", "dedup-minhash-recall-sampled"]


def main() -> None:
    spark = get_spark("r7scale")
    for key in KEYS:
        fn = QUERIES[key]
        for label, d in SCALES:
            fn(spark, "/root/testdata/sf0.001").count()
            cache.release_all(blocking=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                rows = fn(spark, d).collect()
                best = min(best, time.time() - t0)
                cache.release_all(blocking=True)
            print(f"RES {key} {label} {best:.2f}s {rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
