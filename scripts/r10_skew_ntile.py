"""r10 one-off: decade evidence that the exact-rank ntile rewrite no
longer tracks the largest group (the r9 `weak` plans).

Part A isolates the primitive: ntile(3) per group over a synthetic
frame where ONE group holds 90% of rows, at 1M / 10M / 50M rows —
naive ``Window.partitionBy(g)`` + ntile (one task sorts the 90%
stratum) vs ``rank.exact_ntile`` (literal quantile boundaries, bounded
local windows). Keys are md5-derived, so both engines sort real
entropy, not pre-sorted ids.

Part B measures the shipped key end-to-end: ``ccnet_buckets`` on the
documents fixtures with `source` remapped in-flight so 90% of docs
land in one stratum, x1 = sf0.1 (5k docs) / x10 (50k) / x100 (500k).

Protocol: v2 (full materialization), warm-up pass at the smallest
scale, min-of-2 per cell except the largest (1 pass).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from tf_prisma_api_data_ingestion_spark import cache, tables  # noqa: E402
from tf_prisma_api_data_ingestion_spark.actions import materialize  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402


def synth(spark, n):
    h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15),
               16, 10).cast("long")
    return spark.range(n).select(
        "id", (h % 1_000_000).alias("v"),
        F.when(F.col("id") % 10 < 9, F.lit("big"))
         .otherwise(F.concat(F.lit("s"), (F.col("id") % 7).cast("string")))
         .alias("g"))


def naive_ntile(d):
    w = Window.partitionBy("g").orderBy(F.col("v").desc(),
                                        F.col("id").asc())
    return d.withColumn("nt", F.ntile(3).over(w))


def fast_ntile(d):
    from tf_prisma_api_data_ingestion_spark.operators.rank import (
        exact_ntile)
    return exact_ntile(d, 3, "v", desc=True, tiebreak=["id"],
                       group_cols=["g"], out="nt")


def timed(fn, passes=2):
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        materialize(fn())
        best = min(best, time.time() - t0)
        cache.release_all(blocking=True)
    return best


def skewed_docs(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long")
    return d.withColumn(
        "source", F.when(h % 10 < 9, F.lit("big")).otherwise("source"))


def main() -> None:
    spark = get_spark("r10skew")
    # Part A: the primitive, 90%-skewed group
    materialize(fast_ntile(synth(spark, 10_000)))   # warm
    materialize(naive_ntile(synth(spark, 10_000)))
    for n, passes in ((1_000_000, 2), (10_000_000, 2), (50_000_000, 1)):
        tn = timed(lambda: naive_ntile(synth(spark, n)), passes)
        tf_ = timed(lambda: fast_ntile(synth(spark, n)), passes)
        print(f"RES primitive n={n} naive={tn:.2f}s exact={tf_:.2f}s",
              flush=True)
    # Part B: ccnet_buckets end-to-end on 90%-skewed sources
    from tf_prisma_api_data_ingestion_spark.operators.text import (
        ccnet_buckets)
    materialize(ccnet_buckets(skewed_docs(spark, "/root/testdata/sf0.001")))
    for label, d, passes in (("x1", "/root/testdata/sf0.1", 2),
                             ("x10", "/tmp/sf1eq", 2),
                             ("x100", "/tmp/sf10docs", 1)):
        t = timed(lambda: ccnet_buckets(skewed_docs(spark, d)), passes)
        print(f"RES ccnet-skew {label} {t:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
