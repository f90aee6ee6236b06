"""sf1-equivalent scale harness for the RELATIONAL headliners (VERDICT r4
item 4; extends the r3 dedup-family decade to events/lineitem queries).

Builds a 10x copy-shifted dataset in /tmp (testdata is read-only):

- ``events``   x10 with event_id/user_id shifted per copy — key cardinality
  grows 10x, rows-per-key stay constant, so a linear operator should grow
  ~10x in rows and <=10x in wall time.
- ``lineitem`` x10 with l_orderkey shifted — the window/top-k table.
- ``documents`` x10 with doc_id shifted and a per-copy VOCABULARY
  PERMUTATION (see scripts/_scalebuild.py — preserves within-copy
  similarity, quality scores and df statistics EXACTLY while destroying
  cross-copy overlap; replaces the token-suffix construction whose
  normalizer-split suffix tokens made sum(df^2) quadratic and whose
  suffixed stopwords zeroed every quality score).
- every other table copied verbatim.

All replicated tables are written as SINGLE parquet files (DuckDB COPY)
because the streaming file source matches ``pathGlobFilter
events.parquet`` against file names — a directory-style Spark write would
be invisible to it.

Usage:
    python scripts/scale10.py [outdir]     # default /tmp/sf1eq

Prints a markdown table (sf0.1 s, sf1 s, x ratio) for SCALING.md's sf1
section. Timing protocol matches bench.py: warm each query at sf0.001
immediately before its timed runs, two timed passes, report the min.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

SRC = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

KEYS = (
    "top-k-per-group",
    "asof-join",
    "asof-join-forward",
    "op-range-join",
    "op-time-rollup",
    "op-sessionize",
    "op-max-concurrency",
    "stream-window-agg",
    "stream-stream-join",
    "plan-corpus-train",
    # r5 time-series/CDC/sampling additions (events/lineitem/documents all
    # replicate, so every one sees real 10x growth)
    "op-gap-fill",
    "op-scd2",
    "op-window-lag-lead",
    "op-histogram",
    "op-merge-upsert",
    "op-stratified-sample",
    "text-bigram-counts",
    "op-interval-merge",
    "asof-join-nearest",
    "plan-stream-report",
    # late-r5 additions on the replicated tables (events/lineitem/
    # documents) — orders and part stay verbatim, so op-table-diff /
    # op-expectations / op-fuzzy-join see no growth here and are
    # deliberately excluded rather than reported as fake-flat
    "op-funnel",
    "op-retention",
    "op-linreg-group",
    "op-outlier-mad",
    "op-winsorized-mean",
    "op-table-checksum",
    "text-bigram-lift",
    "dedup-passage-exact",
    "dedup-passage-pairs",
    "stream-funnel",
    "plan-multimodal-dedup",
)

VERBATIM = ("region", "nation", "customer", "supplier", "part",
            "orders", "embeddings")


def build(out: str) -> None:
    from _scalebuild import (
        replicate_documents,
        replicate_events,
        replicate_lineitem,
    )
    os.makedirs(out, exist_ok=True)
    for t in VERBATIM:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    replicate_events(f"{SRC}/events.parquet", f"{out}/events.parquet", 10)
    replicate_lineitem(f"{SRC}/lineitem.parquet", f"{out}/lineitem.parquet", 10)
    replicate_documents(f"{SRC}/documents.parquet", f"{out}/documents.parquet", 10)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1eq"
    if not os.path.exists(f"{out}/events.parquet"):
        print(f"# building 10x dataset at {out} ...", file=sys.stderr)
        build(out)

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.catalog import (
        QUERIES,
        THROUGHPUT_QUERIES,
    )
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("scale10")
    tables.assert_contract(spark, SRC)
    for sf in (SRC, out):
        for t in tables.TABLE_NAMES:
            tables.load(spark, sf, t).count()

    def timed(name: str, sf: str) -> float:
        fn = QUERIES.get(name) or THROUGHPUT_QUERIES[name]
        try:
            fn(spark, WARM).count()   # warm-adjacent codegen compile
        except Exception as ex:  # noqa: BLE001 — surface, don't hide
            print(f"# warmup failed for {name}: {ex}", file=sys.stderr)
        cache.release_all(blocking=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf).count()
            best = min(best, time.time() - t0)
            cache.release_all(blocking=True)
        return best

    def _reclaim() -> None:
        # shuffle files persist until their dependency is GC'd; a 13-key
        # min-of-2 sweep over 100x data accumulates tens of GB of dead
        # shuffle in spark.local.dir unless the ContextCleaner is nudged
        spark.sparkContext._jvm.System.gc()

    print("| query | sf0.1 s | sf1 s | x(0.1->1) |")
    print("|---|---|---|---|")
    for name in KEYS:
        a = timed(name, SRC)
        b = timed(name, out)
        _reclaim()
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
