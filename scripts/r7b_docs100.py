"""r7b one-off: sf10docs (documents x100, 500k docs) rows for the
round-7b curation keys, protocol v2. Reuses scale100_docs' corpus
construction (vocabulary-bijected copies: within-copy structure exact,
cross-copy overlap destroyed, df statistics linear)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.actions import materialize  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

OUT = "/tmp/sf10docs"
WARM = "/root/testdata/sf0.001"
KEYS = ["text-gopher-rules", "text-corpus-tv", "text-dsir-score",
        "text-novelty", "stream-quality-gate", "plan-curation-report",
        "plan-semdedup-clean"]


def main() -> None:
    if not os.path.exists(f"{OUT}/documents.parquet"):
        from scale100_docs import build
        print("# building 100x documents ...", file=sys.stderr)
        build(OUT)
    spark = get_spark("r7bdocs100")
    for key in KEYS:
        fn = QUERIES[key]
        try:
            materialize(fn(spark, WARM))
        except Exception as ex:  # noqa: BLE001
            print(f"# warmup failed for {key}: {ex}", file=sys.stderr)
        cache.release_all(blocking=True)
        t0 = time.time()
        materialize(fn(spark, OUT))
        dt = time.time() - t0
        cache.release_all(blocking=True)
        spark.sparkContext._jvm.System.gc()
        print(f"RES {key} sf10docs {dt:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
