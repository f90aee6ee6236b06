"""sf10-equivalent (100x) scale harness for the events/lineitem
relational family — the second decade on top of scripts/scale10.py, so
the scale claim rests on TWO measured 10x steps instead of one.

Builds a 100x copy-shifted dataset in /tmp (events 10M rows, lineitem
60M rows; same key-shift construction as scale10 — key cardinality grows
100x, rows-per-key stay constant). Documents/embeddings are left at
sf0.1 and the text/dedup keys are NOT run here: their sf1 decade lives
in scale10, and the 100x text build (regex-suffixing 60M tokens) costs
more than the information it adds.

    python scripts/scale100.py [outdir]

Prints | query | sf1 s | sf10 s | x(1->10) | using the sf1eq dataset
(/tmp/sf1eq, built by scale10.py) as the comparison point, falling back
to sf0.1 (then labeled x over 100x) if sf1eq is absent.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

SRC = "/root/testdata/sf0.1"
SF1EQ = "/tmp/sf1eq"
WARM = "/root/testdata/sf0.001"

KEYS = (
    "top-k-per-group",
    "asof-join",
    "asof-join-forward",
    "asof-join-nearest",
    "op-range-join",
    "op-time-rollup",
    "op-sessionize",
    "op-max-concurrency",
    "op-gap-fill",
    "op-scd2",
    "op-window-lag-lead",
    "op-histogram",
    "op-merge-upsert",
    "op-interval-merge",
    "stream-window-agg",
    "stream-stream-join",
)

VERBATIM = ("region", "nation", "customer", "supplier", "part",
            "orders", "documents", "embeddings")


def build(out: str) -> None:
    from _scalebuild import replicate_events, replicate_lineitem
    os.makedirs(out, exist_ok=True)
    for t in VERBATIM:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    replicate_events(f"{SRC}/events.parquet", f"{out}/events.parquet", 100)
    replicate_lineitem(f"{SRC}/lineitem.parquet", f"{out}/lineitem.parquet",
                       100)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10eq"
    if not os.path.exists(f"{out}/events.parquet"):
        print(f"# building 100x dataset at {out} ...", file=sys.stderr)
        build(out)
    base = SF1EQ if os.path.exists(f"{SF1EQ}/events.parquet") else SRC
    label = "sf1 s" if base == SF1EQ else "sf0.1 s"

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.catalog import (
        QUERIES,
        THROUGHPUT_QUERIES,
    )
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("scale100")
    tables.assert_contract(spark, SRC)
    for sf in (base, out):
        for t in tables.TABLE_NAMES:
            tables.load(spark, sf, t).count()

    def timed(name: str, sf: str) -> float:
        fn = QUERIES.get(name) or THROUGHPUT_QUERIES[name]
        try:
            fn(spark, WARM).count()
        except Exception as ex:  # noqa: BLE001
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

    print(f"| query | {label} | sf10 s | x(1->10) |")
    print("|---|---|---|---|")
    for name in KEYS:
        a = timed(name, base)
        b = timed(name, out)
        _reclaim()
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
