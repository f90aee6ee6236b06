"""r8 one-off: re-measure the FULL dedup-minhash-recall audit after the
verify-broadcast dial (prefix_filter_jaccard_pairs ships the 250 MB
id->shingles map once instead of 64 GB of per-candidate array freight;
stage timing put 447s of the 488s truth wall in that verify join — two
earlier candidate-join sharding designs measured 753s/1109s vs the
725s unsharded baseline because they targeted a 4s stage).
Protocol identical to scripts/r7_audit_scale.py: warm at sf0.001,
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
KEY = "dedup-minhash-recall"


def main() -> None:
    spark = get_spark("r8scale")
    fn = QUERIES[KEY]
    for label, d, passes in SCALES:
        fn(spark, "/root/testdata/sf0.001").count()
        cache.release_all(blocking=True)
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            rows = fn(spark, d).collect()
            best = min(best, time.time() - t0)
            cache.release_all(blocking=True)
        print(f"RES {KEY} {label} {best:.2f}s {rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
