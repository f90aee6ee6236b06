"""r7 one-off: sf0.001/0.01/0.1 decade rows for the seven round-7 keys
(same warm-adjacent min-of-2 protocol as the SCALING.md main tables)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.actions import materialize  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

SCALES = [("sf0.001", "/root/testdata/sf0.001"),
          ("sf0.01", "/root/testdata/sf0.01"),
          ("sf0.1", "/root/testdata/sf0.1")]
if "--sf1eq" in sys.argv:
    SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1eq", "/tmp/sf1eq")]
KEYS = ["op-linreg2-group", "op-ndcg-retrieval", "op-cohens-kappa",
        "plan-corpus-mix", "text-vocab-coverage", "sim-embed-centroids",
        "op-mrr-retrieval"]
if "--batch2" in sys.argv:
    KEYS = ["op-rrf-fusion", "plan-hybrid-retrieval"]
if "--batch3" in sys.argv:  # r7b data-selection/curation batch
    KEYS = ["text-dsir-score", "text-novelty", "sim-semdedup",
            "sim-silhouette", "text-gopher-rules"]
if "--batch4" in sys.argv:  # r7b curation composite
    KEYS = ["plan-curation-report"]
if "--batch5" in sys.argv:  # r7b TV distance + lexical+semantic funnel
    KEYS = ["text-corpus-tv", "plan-semdedup-clean"]


def main() -> None:
    spark = get_spark("r7new")
    for key in KEYS:
        fn = QUERIES[key]
        for label, d in SCALES:
            materialize(fn(spark, "/root/testdata/sf0.001"))
            cache.release_all(blocking=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                materialize(fn(spark, d))
                best = min(best, time.time() - t0)
                cache.release_all(blocking=True)
            n = fn(spark, d).count()  # untimed, for the rows label
            cache.release_all(blocking=True)
            print(f"RES {key} {label} {best:.2f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
