"""r14 one-off: decade rows for dedup-provenance-incr-near-inv — the
persisted-inventory path — over the same skewed fixtures as SCALING
r13 §5 (scripts/r13_provenance_scale.py builds them; run that first
if /tmp/r13_prov is empty). Protocol per decade (x1/x10/x100 corpus,
fixed 50-doc copy-0 landing batch):

1. ACCEPT-TIME: build + write shingle_inventory(corpus) to parquet,
   timed once — the amortized per-corpus cost a daily job pays by
   appending, never re-paying per batch.
2. PER-BATCH: near_dup_provenance_incremental_from_inventory(batch,
   inventory) wall, min-of-passes — the number that must be
   batch-bounded. r13 §5 measured the DIRECT path at 10.7x wall per
   100x corpus, all of it index rebuild; the bar here is ~<=3x
   (the residual growth is the linear postings scan feeding the
   broadcast semi-join — no shuffle grows with the corpus).
3. DIRECT per-batch wall at the same decade for the side-by-side.

The bijection fixtures destroy cross-copy overlap, so the output
matrix is FIXED across decades (logged cells/pairs prove it) — flat
output + bounded wall is the batch-boundedness evidence.
Results: SCALING.md "r14: persisted near-dup inventory".
"""

import os
import sys
import time

sys.path.insert(0, ".")

LOG = "/tmp/r14_inv/scale.log"


def log(m):
    print(m, flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(m + "\n")


def main():
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        near_dup_provenance_incremental,
        near_dup_provenance_incremental_from_inventory,
        shingle_inventory)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_incr_near_inv_scale")
    for copies in (1, 10, 100):
        docs = spark.read.parquet(
            f"/tmp/r13_prov/docs_x{copies}.parquet")
        n = docs.count()
        batch = docs.filter((F.col("doc_id") < 100_000_000)
                            & (F.col("doc_id") % 100 == 0))
        corpus = docs.exceptAll(batch)

        inv_path = f"/tmp/r14_inv/inventory_x{copies}"
        t0 = time.time()
        shingle_inventory(corpus).write.mode("overwrite") \
            .parquet(inv_path)
        w_accept = time.time() - t0
        inv = spark.read.parquet(inv_path)
        n_post = inv.count()
        log(f"# accept x{copies}: inventory {n_post} postings "
            f"built+written in {w_accept:.2f}s")

        near_dup_provenance_incremental_from_inventory(
            batch.limit(20), inv).collect()  # warm
        passes = 3 if copies < 100 else 2
        best, cells, pairs = float("inf"), None, None
        for _ in range(passes):
            t0 = time.time()
            rows = near_dup_provenance_incremental_from_inventory(
                batch, inv).collect()
            best = min(best, time.time() - t0)
            cells = len(rows)
            pairs = sum(r["dup_pairs"] for r in rows)
        log(f"# inv-batch x{copies}: batch 50 vs corpus {n - 50}, "
            f"{best:.2f}s, {cells} cells, {pairs} pairs")

        near_dup_provenance_incremental(
            batch.limit(20), corpus.limit(300)).collect()  # warm
        best_d = float("inf")
        for _ in range(passes if copies < 100 else 1):
            t0 = time.time()
            near_dup_provenance_incremental(batch, corpus).collect()
            best_d = min(best_d, time.time() - t0)
        log(f"# direct-batch x{copies}: {best_d:.2f}s")
    spark.stop()
    log("# DONE")


if __name__ == "__main__":
    main()
