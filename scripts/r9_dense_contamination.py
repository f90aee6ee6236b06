"""r9 one-off: measure text-contamination-coverage in the DENSE regime.

The r8 decade row was fixture-saturated: the x100 copy bijection
destroys cross-copy vocabulary overlap, so matched-interval volume
stopped growing with the corpus and the 17.1s -> 21.1s top decade
measured only the sparse-match regime. This script builds deliberately
contaminated fixtures — every odd-id non-benchmark document gets the
first 25 tokens of its own copy's nearest benchmark document (id
rounded down to the bench stratum doc_id % 100 == 0) appended, so ~50%
of the corpus carries a >= 21-window matched run at EVERY decade — and
records the coverage query's decade walls on them. The injection is
same-copy by construction, so the density survives the bijection.

Protocol: warm at sf0.001, min-of-2 per decade, single pass at the top
(same v2 protocol as scripts/r8_newkeys_scale.py).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

SCALES = [("densex1", "/root/testdata/sf0.1", "/tmp/densex1", 2),
          ("densex10", "/tmp/sf1eq", "/tmp/densex10", 2),
          ("densex100", "/tmp/sf10docs", "/tmp/densex100", 1)]


def build(src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # inject: odd-id corpus docs append the first 25 whitespace tokens
    # of their copy-local benchmark doc (largest bench id <= doc_id)
    con.execute(f"""
COPY (
  WITH d AS (SELECT * FROM '{src_dir}/documents.parquet'),
  bench AS (SELECT doc_id AS bid,
                   array_to_string(list_slice(
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> ''), 1, 25), ' ') AS patch
            FROM d WHERE doc_id % 100 = 0)
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 100 <> 0 AND d.doc_id % 2 = 1
              THEN d.text || ' ' || b.patch ELSE d.text END AS text,
         d.lang, d.source, d.n_chars
  FROM d LEFT JOIN bench b ON b.bid = d.doc_id - (d.doc_id % 100)
) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
""")
    con.close()


def main() -> None:
    from tf_prisma_api_data_ingestion_spark import cache
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    for _, src, out, _ in SCALES:
        if not os.path.exists(f"{out}/documents.parquet"):
            t0 = time.time()
            build(src, out)
            print(f"BUILD {out} {time.time() - t0:.1f}s", flush=True)

    spark = get_spark("r9dense")
    fn = QUERIES["text-contamination-coverage"]
    for label, _, d, passes in SCALES:
        materialize(fn(spark, "/root/testdata/sf0.001"))
        cache.release_all(blocking=True)
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            materialize(fn(spark, d))
            best = min(best, time.time() - t0)
            cache.release_all(blocking=True)
        # density check: how many docs are flagged / matched
        from pyspark.sql import functions as F
        out = fn(spark, d)
        stats = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("covered_tokens") > 0).cast("long")).alias("matched"),
            F.sum("covered_tokens").alias("covered")).collect()[0]
        cache.release_all(blocking=True)
        print(f"RES text-contamination-coverage {label} {best:.2f}s "
              f"docs={stats['docs']} matched={stats['matched']} "
              f"covered={stats['covered']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
