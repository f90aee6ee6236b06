"""r13 one-off: decade rows for dedup-provenance-near (r12 verdict
item 3) and the new dedup-provenance-incremental, under a SKEWED
source mix.

Protocol: sf0.1 documents replicated x1/x10/x100 with the per-copy
content-vocabulary bijection (scripts/_scalebuild.replicate_documents
— within-copy near-dup structure preserved exactly, cross-copy
overlap destroyed, so true pair volume grows linearly), then the
source column rewritten to a skewed mix: doc_id % 10 < 7 -> the
dominant source, else the original source. doc_id % 10 is
copy-invariant (copy offset is 1e8), so the skew pattern — and with
it the provenance CELL SET — is identical at every decade while
per-cell counts grow linearly. The dominant source concentrates ~70%
of every (doc_id, source) rollup join's probe side on one key, which
is exactly the skew the r12 verdict wanted measured rather than
argued.

Timed per decade (warm min-of-3; min-of-2 at x100):
- near_dup_provenance (the full banded-LSH + verify + rollup)
- passage_provenance_incremental with a FIXED batch (copy 0's
  doc_id % 100 == 0 docs, ~50 docs) against the growing corpus —
  the daily-ingest shape: wall growth across decades isolates the
  corpus's linear hash-scan term, everything joined staying
  batch-bounded.

Results land as SCALING.md rows ("r13: provenance decades").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

OUT_DIR = "/tmp/r13_prov"
SRC = "/root/testdata/sf0.1/documents.parquet"
LOG = os.path.join(OUT_DIR, "progress.log")


def log(msg: str) -> None:
    print(msg, flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def build(copies: int) -> str:
    import duckdb

    from _scalebuild import replicate_documents

    raw = os.path.join(OUT_DIR, f"docs_x{copies}_raw.parquet")
    out = os.path.join(OUT_DIR, f"docs_x{copies}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(OUT_DIR, exist_ok=True)
    t0 = time.time()
    replicate_documents(SRC, raw, copies)
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT doc_id, text, lang,
                     CASE WHEN doc_id % 10 < 7 THEN 'dominant'
                          ELSE source END AS source, n_chars
              FROM '{raw}')
        TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)""")
    os.remove(raw)
    log(f"# built x{copies} ({time.time() - t0:.1f}s)")
    return out


def main() -> None:
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.operators.dedup import (
        near_dup_provenance, passage_provenance_incremental)
    from tf_prisma_api_data_ingestion_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("r13_provenance_scale")
    for copies in (1, 10, 100):
        path = build(copies)
        docs = spark.read.parquet(path)
        n = docs.count()
        passes = 3 if copies < 100 else 2

        # warm the pipelines on a tiny slice
        near_dup_provenance(docs.limit(300)).collect()

        best, cells = float("inf"), None
        for _ in range(passes):
            t0 = time.time()
            rows = near_dup_provenance(docs).collect()
            best = min(best, time.time() - t0)
            cells = len(rows)
        pairs = sum(r["dup_pairs"] for r in rows)
        log(f"# near x{copies}: {n} docs, {best:.2f}s, "
            f"{cells} cells, {pairs} dup_pairs")

        batch = docs.filter((F.col("doc_id") < 100_000_000)
                            & (F.col("doc_id") % 100 == 0))
        corpus = docs.exceptAll(batch)
        nb = batch.count()
        passage_provenance_incremental(
            batch.limit(20), corpus.limit(300)).collect()
        best, cells = float("inf"), None
        for _ in range(passes):
            t0 = time.time()
            rows = passage_provenance_incremental(batch, corpus).collect()
            best = min(best, time.time() - t0)
            cells = len(rows)
        log(f"# incr x{copies}: batch {nb} vs corpus {n - nb}, "
            f"{best:.2f}s, {cells} cells")
    spark.stop()
    log("# DONE")


if __name__ == "__main__":
    main()
