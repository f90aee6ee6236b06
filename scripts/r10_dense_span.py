"""r10 one-off: measure text-span-dedup in the DENSE regime.

The r9 decade row was vocabulary-disjoint (the x100 copy bijection
keeps duplicated spans within-copy), the same saturation the r8
contamination row had. This script reuses the r9 dense-contamination
technique for SPANS: every odd-id non-benchmark document is padded to
an 8-token boundary with a doc-unique filler token (the span key's
sentence view chunks consecutive 8-token groups, so the shared content
must land sentence-ALIGNED to produce identical span hashes) and then
appends the first 24 tokens (= exactly 3 sentence units) of its
copy-local benchmark document (doc_id rounded down to the % 100 == 0
stratum). Result: ~50% of the corpus carries a shared three-sentence
span whose duplicate group is ~50 occurrences per century at EVERY
decade — keeper election and the island merge see matched volume 10x
per decade, the regime the r9 fixture couldn't reach.

Protocol: warm at sf0.001, min-of-2 per decade, single pass at the top
(v2 protocol, full materialization).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

SCALES = [("spanx1", "/root/testdata/sf0.1", "/tmp/spanx1", 2),
          ("spanx10", "/tmp/sf1eq", "/tmp/spanx10", 2),
          ("spanx100", "/tmp/sf10docs", "/tmp/spanx100", 1)]


def build(src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
COPY (
  WITH d AS (
    SELECT *, len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS nt
    FROM '{src_dir}/documents.parquet'),
  bench AS (
    SELECT doc_id AS bid,
           array_to_string(list_slice(
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> ''), 1, 24), ' ') AS patch
    FROM d WHERE doc_id % 100 = 0)
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 100 <> 0 AND d.doc_id % 2 = 1
              THEN d.text || ' '
                   || array_to_string(list_transform(
                        range((8 - (d.nt % 8)) % 8),
                        x -> 'zz' || CAST(d.doc_id AS VARCHAR)), ' ')
                   || ' ' || b.patch
              ELSE d.text END AS text,
         d.lang, d.source, d.n_chars
  FROM d LEFT JOIN bench b ON b.bid = d.doc_id - (d.doc_id % 100)
) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
""")
    con.close()


def main() -> None:
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark import cache
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    for _, src, out, _ in SCALES:
        if not os.path.exists(f"{out}/documents.parquet"):
            t0 = time.time()
            build(src, out)
            print(f"BUILD {out} {time.time() - t0:.1f}s", flush=True)

    spark = get_spark("r10dense")
    fn = QUERIES["text-span-dedup"]
    for label, _, d, passes in SCALES:
        materialize(fn(spark, "/root/testdata/sf0.001"))
        cache.release_all(blocking=True)
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            materialize(fn(spark, d))
            best = min(best, time.time() - t0)
            cache.release_all(blocking=True)
        out = fn(spark, d)
        stats = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("removed_sentences") > 0).cast("long"))
             .alias("docs_cut"),
            F.sum("n_dup_spans").alias("dup_spans"),
            F.sum("removed_sentences").alias("removed")).collect()[0]
        cache.release_all(blocking=True)
        print(f"RES text-span-dedup {label} {best:.2f}s "
              f"docs={stats['docs']} docs_cut={stats['docs_cut']} "
              f"dup_spans={stats['dup_spans']} removed={stats['removed']}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
