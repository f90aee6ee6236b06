"""sf1-equivalent scale harness for the RELATIONAL headliners (VERDICT r4
item 4; extends the r3 dedup-family decade to events/lineitem queries).

Builds a 10x copy-shifted dataset in /tmp (testdata is read-only):

- ``events``   x10 with event_id/user_id shifted per copy — key cardinality
  grows 10x, rows-per-key stay constant, so a linear operator should grow
  ~10x in rows and <=10x in wall time.
- ``lineitem`` x10 with l_orderkey shifted — the window/top-k table.
- ``documents`` x10 with doc_id shifted and every token copy-suffixed
  (within-copy near-dup structure preserved, cross-copy similarity
  destroyed) — same construction as the r3 dedup harness, reused here so
  the benched plan-corpus-train composite gets an sf1 row.
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

import duckdb

sys.path.insert(0, ".")

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
)

VERBATIM = ("region", "nation", "customer", "supplier", "part",
            "orders", "embeddings")


def build(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in VERBATIM:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SRC}/events.parquet'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SRC}/lineitem.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SRC}/documents.parquet'")
    con.execute(f"""
        COPY (SELECT * REPLACE (event_id + i * 1000000000 AS event_id,
                                user_id + i * 10000000 AS user_id)
              FROM events CROSS JOIN range(10) t(i))
        TO '{out}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT * REPLACE (l_orderkey + i * 1000000000 AS l_orderkey)
              FROM lineitem CROSS JOIN range(10) t(i))
        TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT doc_id + i * 100000000 AS doc_id,
                     regexp_replace(text, '(\\S+)', '\\1_c' || i, 'g') AS text,
                     lang, source,
                     CAST(length(regexp_replace(text, '(\\S+)', '\\1_c' || i,
                                                'g')) AS BIGINT) AS n_chars
              FROM documents CROSS JOIN range(10) t(i))
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")


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

    print("| query | sf0.1 s | sf1 s | x(0.1->1) |")
    print("|---|---|---|---|")
    for name in KEYS:
        a = timed(name, SRC)
        b = timed(name, out)
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
