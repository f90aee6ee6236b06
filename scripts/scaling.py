"""Scaling measurement: run the bench headline queries at every provided
scale factor and print a markdown table of wall times plus the 0.01->0.1
ratio (10x data). Queries whose ratio is far below 10 are overhead-bound
at this size; far above 10 signals super-linear work (the thing to fix).

    python scripts/scaling.py > SCALING.md
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE
    from tf_prisma_api_data_ingestion_spark.catalog import (
        QUERIES,
        THROUGHPUT_QUERIES,
    )
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("scaling")
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark import cache, tables
    tables.assert_contract(spark, SFS[0])
    for sf in SFS:
        for t in tables.TABLE_NAMES:
            tables.load(spark, sf, t).count()
    times: dict[str, list[float]] = {}
    # query-major, SAME protocol as bench.py: warm-adjacent sf0.001 run
    # immediately before each timed sf (the JVM codegen cache holds ~100
    # classes — a sweep-ordered warmup lets later compiles evict earlier
    # ones), then two timed passes, report the min
    for name in HEADLINE:
        fn = QUERIES.get(name) or THROUGHPUT_QUERIES[name]
        for sf in SFS:
            try:
                materialize(fn(spark, SFS[0]))
            except Exception as ex:  # noqa: BLE001 — surface cold-compile risk
                print(f"# warmup failed for {name}: {ex}", file=sys.stderr)
            cache.release_all(blocking=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                materialize(fn(spark, sf))
                best = min(best, time.time() - t0)
                # same hygiene as bench.py: a stale cache from query N
                # inflates query N+1's persist pressure
                cache.release_all(blocking=True)
            times.setdefault(name, []).append(best)

    print("# SCALING — headline query wall time vs scale factor\n")
    print("Measured on local[$SPARK_GRAFT_CPUS]; data grows 10x per column.")
    print("`x(0.01->0.1)` is the growth ratio over the last 10x step —")
    print("~1x = fixed-overhead-bound, ~10x = linear in data, >>10x = fix me.\n")
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | x(0.01->0.1) |")
    print("|---|---|---|---|---|")
    for name, ts in times.items():
        ratio = ts[2] / ts[1] if ts[1] > 0 else float("nan")
        print(f"| {name} | {ts[0]:.2f} | {ts[1]:.2f} | {ts[2]:.2f} | {ratio:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
