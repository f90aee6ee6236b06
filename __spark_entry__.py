"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``tf_prisma_api_data_ingestion_spark.catalog``;
this module only adapts it to the driver's function signatures.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (EP3 alert report over events) on sf0.001."""
    from tf_prisma_api_data_ingestion_spark.catalog import q_plan_alert_report
    return q_plan_alert_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline
    extensions). Each callable takes (spark, sf_dir) and returns a
    DataFrame with columns aliased to match ``oracle_sql``."""
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key; keys without an oracle
    (hash-seeded LSH internals) get the driver's rows-only check and are
    invariant-tested in tests/ instead."""
    from tf_prisma_api_data_ingestion_spark.catalog import ORACLES
    return dict(ORACLES)
