"""r10b one-off: decade rows for the round's two tail keys.
op-score-calibration scales on the documents axis (x1 sf0.1 5k ->
x10 sf1eq 50k -> x100 sf10docs 500k; corpora from
r10b_subword_scale). sim-embedding-outliers scales on the embeddings
axis in the PRODUCTION cluster regime (r7b_emb_scale's
--scaled-clusters construction: cluster count grows with the corpus,
cluster size fixed, so the per-cluster exact-percentile work grows
linearly). v2 protocol: warm at sf0.001, min-of-2 (single pass at
the top)."""

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


def main() -> None:
    from r7b_emb_scale import OUT_SC, OUT_SC100, build
    if not os.path.exists(f"{OUT_SC}/embeddings.parquet"):
        build(OUT_SC, scale_clusters=True, copies=10)
    if not os.path.exists(f"{OUT_SC100}/embeddings.parquet"):
        build(OUT_SC100, scale_clusters=True, copies=100)
    cells = {
        "op-score-calibration": [
            ("sf0.1", "/root/testdata/sf0.1", 2),
            ("sf1eq", "/tmp/sf1eq", 2),
            ("sf10docs", "/tmp/sf10docs", 1)],
        "sim-embedding-outliers": [
            ("sf0.1", "/root/testdata/sf0.1", 2),
            ("embx10sc", OUT_SC, 2),
            ("embx100sc", OUT_SC100, 1)],
    }
    spark = get_spark("r10btail")
    for key, scales in cells.items():
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
