"""r13 one-off: decade rows for dedup-provenance-incr-near over the
skewed fixtures scripts/r13_provenance_scale.py builds (run that
first) — fixed 50-doc landing batch vs the x1/x10/x100 corpus. The
bijection destroys cross-copy overlap, so the copy-0 batch can only
match copy-0 corpus docs: output is FIXED across decades while the
index-side inverted-postings build (the documented per-call
corpus-sized pass; a maintained table in production) grows — the flat
output at a 100x index is what proves the join/rollup stages are
batch-bounded. Results: SCALING.md r13 §5."""
import os
import sys
import time

sys.path.insert(0, ".")

LOG = "/tmp/r13_prov/incr_near.log"


def log(m):
    print(m, flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(m + "\n")


def main():
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        near_dup_provenance_incremental)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r13_incr_near_scale")
    for copies in (1, 10, 100):
        docs = spark.read.parquet(
            f"/tmp/r13_prov/docs_x{copies}.parquet")
        n = docs.count()
        batch = docs.filter((F.col("doc_id") < 100_000_000)
                            & (F.col("doc_id") % 100 == 0))
        corpus = docs.exceptAll(batch)
        near_dup_provenance_incremental(
            batch.limit(20), corpus.limit(300)).collect()  # warm
        passes = 3 if copies < 100 else 2
        best, cells, pairs = float("inf"), None, None
        for _ in range(passes):
            t0 = time.time()
            rows = near_dup_provenance_incremental(batch,
                                                   corpus).collect()
            best = min(best, time.time() - t0)
            cells = len(rows)
            pairs = sum(r["dup_pairs"] for r in rows)
        log(f"# incr-near x{copies}: batch 50 vs corpus {n - 50}, "
            f"{best:.2f}s, {cells} cells, {pairs} pairs")
    spark.stop()
    log("# DONE")


if __name__ == "__main__":
    main()
