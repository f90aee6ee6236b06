"""r14 one-off: decade rows for dedup-incr-lsh-inv — the persisted
MinHash-signature index — over the same skewed bijection fixtures as
SCALING r13 §5 / r14 §1 (fixed 50-doc copy-0 landing batch vs the
x1/x10/x100 corpus). Protocol per decade:

1. ACCEPT-TIME: build + write lsh_inventory(corpus) (the 64-hash
   signature pass is the corpus-sized cost a daily job amortizes by
   appending).
2. PER-BATCH: incremental_minhash_pairs_from_inventory(batch, inv),
   warm min-of-passes — band-collision candidates + exact verify;
   the bar is the postings path's (FLAT per-batch wall, r14 §1).

The bijection fixtures destroy cross-copy overlap so the pair set is
fixed across decades. Results: SCALING.md "r14 §1b".
"""

import os
import sys
import time

sys.path.insert(0, ".")

LOG = "/tmp/r14_lsh/scale.log"


def log(m):
    print(m, flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(m + "\n")


def main():
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        incremental_minhash_pairs_from_inventory, lsh_inventory)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_lsh_inv_scale")
    for copies in (1, 10, 100):
        docs = spark.read.parquet(
            f"/tmp/r13_prov/docs_x{copies}.parquet")
        n = docs.count()
        batch = docs.filter((F.col("doc_id") < 100_000_000)
                            & (F.col("doc_id") % 100 == 0))
        corpus = docs.exceptAll(batch)

        inv_path = f"/tmp/r14_lsh/inventory_x{copies}"
        t0 = time.time()
        lsh_inventory(corpus).write.mode("overwrite").parquet(inv_path)
        w_accept = time.time() - t0
        inv = spark.read.parquet(inv_path)
        log(f"# accept x{copies}: lsh inventory {inv.count()} docs "
            f"built+written in {w_accept:.2f}s")

        incremental_minhash_pairs_from_inventory(
            batch.limit(20), inv).collect()  # warm
        passes = 3 if copies < 100 else 2
        best, pairs = float("inf"), None
        for _ in range(passes):
            t0 = time.time()
            rows = incremental_minhash_pairs_from_inventory(
                batch, inv).collect()
            best = min(best, time.time() - t0)
            pairs = len(rows)
        log(f"# lsh-batch x{copies}: batch 50 vs corpus {n - 50}, "
            f"{best:.2f}s, {pairs} pairs")
    spark.stop()
    log("# DONE")


if __name__ == "__main__":
    main()
