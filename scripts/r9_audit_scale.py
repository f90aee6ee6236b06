"""r9 one-off: re-measure the FULL dedup-minhash-recall audit after the
signature min-before-conv hoist (dedup.py minhash_lsh_pairs_md5: the
base-16 parse now runs once per (doc, seed) instead of once per
(doc, seed, shingle); bit-identical signatures, measured 1.6x faster
on the signature stage, which the r8 reading identified as the
dominant LSH-side term at 500k docs).
Protocol identical to scripts/r8_audit_scale.py: warm at sf0.001,
min-of-2 at sf0.1 / sf1eq, single pass at sf10docs."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

SCALES = [("sf0.1", "/root/testdata/sf0.1", 2),
          ("sf1eq", "/tmp/sf1eq", 2),
          ("sf10docs", "/tmp/sf10docs", 1)]
KEYS = ("dedup-minhash-recall", "dedup-minhash-recall-sampled")


def main() -> None:
    spark = get_spark("r9scale")
    for key in KEYS:
        fn = QUERIES[key]
        for label, d, passes in SCALES:
            fn(spark, "/root/testdata/sf0.001").count()
            cache.release_all(blocking=True)
            best = float("inf")
            for _ in range(passes):
                t0 = time.time()
                rows = fn(spark, d).collect()
                best = min(best, time.time() - t0)
                cache.release_all(blocking=True)
            print(f"RES {key} {label} {best:.2f}s {rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
