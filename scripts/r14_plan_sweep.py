"""Round-14: plan-shape sweep over the whole catalog.

For every catalog key (streaming keys excluded — their construction
drains the query), build the DataFrame at $SPARK_GRAFT_SF_DIR and record
formatted-plan statistics: parquet scans, exchanges, sort-merge joins,
Python-boundary nodes, plan lines. Output: TSV on stdout (grep ^ROW).
Flags keys whose scan count exceeds the distinct tables they read —
the duplicate-subtree smell the r14 optimization round hunts.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_plan_sweep")
    for t in tables.TABLE_NAMES:
        tables.load(spark, sf_dir, t).count()

    for key, fn in QUERIES.items():
        if key.startswith("stream-"):
            print(f"ROW\t{key}\tSKIP-streaming", flush=True)
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001
            print(f"ROW\t{key}\tERROR\t{type(ex).__name__}", flush=True)
            cache.release_all(blocking=True)
            continue
        scans = len(re.findall(r"Scan parquet", plan))
        tabs = len(set(re.findall(r"testdata/sf[0-9.]+/(\w+)", plan)))
        ex_n = len(re.findall(r"\bExchange\b", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        py = len(re.findall(r"EvalPython|MapInPandas|MapInArrow"
                            r"|FlatMapGroupsInPandas", plan))
        lines = plan.count("\n")
        dt = time.time() - t0
        print(f"ROW\t{key}\t{scans}\t{tabs}\t{ex_n}\t{smj}\t{py}\t{lines}"
              f"\t{dt:.1f}", flush=True)
        cache.release_all(blocking=True)
    spark.stop()


if __name__ == "__main__":
    main()
