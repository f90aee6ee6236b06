"""Loaders for the driver-provided synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under /root/testdata/sf*/.

We read with explicit paths (no catalog) and rely on Catalyst for column
pruning / predicate pushdown into the parquet scan. At 100 TB these would
be partitioned/bucketed external tables; the loader API stays the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    # Defensive session confs (runtime-settable), because the DRIVER
    # supplies its own session without session.get_spark's settings:
    # - UTC: date_format/strftime parity with the (timezone-naive) DuckDB
    #   oracle; otherwise formatted timestamps shift by the host zone.
    # - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark 4
    #   rejects outright otherwise.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def event_ts(col: str = "ts"):
    """events.ts (nanos-as-long, see ``load``) -> TimestampType.

    Integer DIV keeps full precision — a double division would lose bits
    above 2^53 (epoch-nanos is ~1.7e18).
    """
    from pyspark.sql import functions as F
    return F.timestamp_micros(F.expr(f"{col} DIV 1000"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works too."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
