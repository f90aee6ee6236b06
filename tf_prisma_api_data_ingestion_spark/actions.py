"""Benchmark-grade actions.

``materialize`` is the timing action for every harness in this repo
(bench.py, scripts/scaling.py, the per-round scale scripts,
scripts/oraclebench.py). It executes the FULL query — every column of
every row — via Spark's built-in ``noop`` sink (a real DataSourceV2
write that consumes rows and discards them, the standard Spark
benchmarking sink).

Why not ``df.count()``: Catalyst prunes columns through the plan for a
count, and for a query whose last operator is an Aggregate that prunes
every aggregate EXPRESSION — count(groupBy(k).agg(sums)) only needs the
group keys, so the sums never execute; a cardinality-preserving join
feeding only pruned columns is eliminated entirely, taking its whole
subtree with it. Measured on this corpus at sf0.1: tpch-q1 0.33s under
count() vs 0.95s fully materialized (the eight aggregate sums never
ran); plan-curation-report 0.83s vs 2.59s (the DSIR scoring branch —
an entire corpus scan — was pruned out by the report's left join).
Correctness gates were never affected (selfcheck/drivercheck compare
full toPandas() values); only wall-clock protocols were flattered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> None:
    """Execute ``df`` end to end, all columns, discarding the rows."""
    df.write.format("noop").mode("overwrite").save()
