"""r10b one-off: decade rows for the subword-tokenizer keys and the
corpus datasheet on the documents axis (x1 = sf0.1 5k docs, x10 =
sf1eq 50k, x100 = sf10docs 500k). Protocol: warm at sf0.001,
min-of-2 per decade, single pass at the top (v2, full
materialization). The copy-scaled corpora use the token bijection
"w -> w || 'c<i>'" (scripts/_scalebuild.py), which grows the
DISTINCT-WORD frame linearly with copies — exactly the axis the
subword encoders' vocab-sized segmentation claim is about (words
stay <= 12 chars, so every copy's vocabulary still segments rather
than taking the long-word unk exit)."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

SRC = "/root/testdata/sf0.1"

KEYS = ("text-unigram-segment", "op-unigram-estep",
        "text-wordpiece-encode", "plan-corpus-datasheet",
        "op-vocab-growth")
SCALES = [("sf0.1", "/root/testdata/sf0.1", 2),
          ("sf1eq", "/tmp/sf1eq", 2),
          ("sf10docs", "/tmp/sf10docs", 1)]

VERBATIM = ("region", "nation", "customer", "supplier", "part",
            "orders", "embeddings")


def ensure_corpora() -> None:
    from _scalebuild import (replicate_documents, replicate_events,
                             replicate_lineitem)
    if not os.path.exists("/tmp/sf1eq/documents.parquet"):
        os.makedirs("/tmp/sf1eq", exist_ok=True)
        for t in VERBATIM:
            shutil.copy(f"{SRC}/{t}.parquet", f"/tmp/sf1eq/{t}.parquet")
        replicate_events(f"{SRC}/events.parquet",
                         "/tmp/sf1eq/events.parquet", 10)
        replicate_lineitem(f"{SRC}/lineitem.parquet",
                           "/tmp/sf1eq/lineitem.parquet", 10)
        replicate_documents(f"{SRC}/documents.parquet",
                            "/tmp/sf1eq/documents.parquet", 10)
    if not os.path.exists("/tmp/sf10docs/documents.parquet"):
        os.makedirs("/tmp/sf10docs", exist_ok=True)
        for t in VERBATIM:
            shutil.copy(f"{SRC}/{t}.parquet",
                        f"/tmp/sf10docs/{t}.parquet")
        shutil.copy(f"{SRC}/events.parquet",
                    "/tmp/sf10docs/events.parquet")
        shutil.copy(f"{SRC}/lineitem.parquet",
                    "/tmp/sf10docs/lineitem.parquet")
        replicate_documents(f"{SRC}/documents.parquet",
                            "/tmp/sf10docs/documents.parquet", 100)


def main() -> None:
    from tf_prisma_api_data_ingestion_spark import cache
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    ensure_corpora()
    spark = get_spark("r10bsubword")
    for key in KEYS:
        fn = QUERIES[key]
        for label, d, passes in SCALES:
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
