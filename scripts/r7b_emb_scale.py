"""r7b one-off: embeddings x10 step for sim-semdedup / sim-silhouette.

Construction (the round-3 protocol, rebuilt): 10 copies of sf0.1
embeddings (20 000 vectors), copy i circularly rotated by 7*i
dimensions — rotation is orthogonal, so within-copy geometry (cosines,
centroid distances) is preserved exactly; labels are preserved, so the
cluster COUNT stays fixed while every cluster grows 10x. That is the
deliberately hostile regime for SemDeDup: its pairwise stage is
sum(|cluster|^2), so 10x vectors at fixed cluster count is ~100x pair
work — the measurement shows the quadratic-within-cluster term
honestly (production holds cluster SIZE constant by scaling the
cluster count with the corpus, which keeps the term linear).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from tf_prisma_api_data_ingestion_spark import cache  # noqa: E402
from tf_prisma_api_data_ingestion_spark.actions import materialize  # noqa: E402
from tf_prisma_api_data_ingestion_spark.catalog import QUERIES  # noqa: E402
from tf_prisma_api_data_ingestion_spark.session import get_spark  # noqa: E402

OUT = "/tmp/embx10"
OUT_SC = "/tmp/embx10sc"   # --scaled-clusters: labels offset per copy
OUT_SC100 = "/tmp/embx100sc"  # --x100: 100 copies, scaled clusters
SRC = "/root/testdata/sf0.1"


def build(out: str = OUT, scale_clusters: bool = False,
          copies: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    ids = t["vec_id"].to_numpy()
    labels = t["label"].to_numpy()
    n = len(ids)
    parts = []
    n_labels = int(labels.max()) + 1
    # NOTE: np.roll has only `dim` distinct rotations, so past 64 copies
    # some copy PAIRS share geometry — harmless under scaled clusters:
    # labels are copy-local, so cross-copy vectors never share a cluster
    # and the per-cluster work is unaffected.
    for i in range(copies):
        lab = labels + i * n_labels if scale_clusters else labels
        parts.append(pa.table({
            "vec_id": pa.array(ids + i * n, type=t.schema.field("vec_id").type),
            "embedding": pa.array(
                np.roll(vecs, 7 * i, axis=1).tolist(),
                type=t.schema.field("embedding").type),
            "label": pa.array(lab, type=t.schema.field("label").type),
        }))
    pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet")
    # the two keys only read embeddings; link the rest verbatim
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)


def main() -> None:
    # --scaled-clusters: the PRODUCTION regime — the quantizer's cluster
    # count scales with the corpus (each copy keeps its own 10 labels),
    # so cluster SIZE stays fixed and sum(|cluster|^2) grows linearly.
    # The default (fixed cluster count) is the hostile regime the main
    # table documents. Measuring both proves the documented dial.
    scaled = "--scaled-clusters" in sys.argv
    out, tag = (OUT_SC, "embx10sc") if scaled else (OUT, "embx10")
    copies = 10
    if "--x100" in sys.argv:   # 100x vectors, production cluster scaling
        out, tag, scaled, copies = OUT_SC100, "embx100sc", True, 100
    if not os.path.exists(f"{out}/embeddings.parquet"):
        build(out, scale_clusters=scaled, copies=copies)
    spark = get_spark("r7bemb")
    for key in ("sim-semdedup", "sim-silhouette"):
        fn = QUERIES[key]
        for label, d in (("sf0.1", SRC), (tag, out)):
            materialize(fn(spark, "/root/testdata/sf0.001"))
            cache.release_all(blocking=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                materialize(fn(spark, d))
                best = min(best, time.time() - t0)
                cache.release_all(blocking=True)
            cnt = fn(spark, d).count()  # untimed, for the rows label
            cache.release_all(blocking=True)
            print(f"RES {key} {label} {best:.2f}s rows={cnt}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
