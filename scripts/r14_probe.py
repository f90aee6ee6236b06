"""Round-14 optimization probe: per-query isolated timing + plan capture.

Usage:
    python scripts/r14_probe.py [--plans-dir plans/r14 --suffix _before]
                                [--reps 3] key [key ...]

For each catalog key: warm once at sf0.001, then time `reps` noop-sink
materializations at $SPARK_GRAFT_SF_DIR (default sf0.1) and report the
min (the bench protocol's number), and write `.explain('formatted')` to
<plans-dir>/<key><suffix>.txt. Prints one line per key:
    key  min_sec  [all reps]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--plans-dir", default=None,
                    help="directory for explain('formatted') captures")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_sf = "/root/testdata/sf0.001"

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.catalog import (
        QUERIES,
        THROUGHPUT_QUERIES,
    )
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_probe")
    for t in tables.TABLE_NAMES:
        tables.load(spark, sf_dir, t).count()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    for key in args.keys:
        fn = QUERIES.get(key) or THROUGHPUT_QUERIES[key]
        spark.sparkContext.setJobDescription(f"r14_probe:{key}")
        if args.plans_dir:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{key}{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        if args.reps <= 0:
            print(f"{key}\tplan-captured", flush=True)
            cache.release_all(blocking=True)
            continue
        if not args.no_warm:
            try:
                materialize(fn(spark, warm_sf))
            except Exception as ex:  # noqa: BLE001
                print(f"# warmup failed for {key}: {ex}", file=sys.stderr)
        cache.release_all(blocking=True)
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
            cache.release_all(blocking=True)
        print(f"{key}\t{min(walls):.3f}\t{walls}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
