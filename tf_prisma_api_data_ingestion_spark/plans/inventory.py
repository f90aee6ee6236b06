"""EP1 — the inventory + per-service resource-type report pipeline
(handler, /root/reference/modules/src/prisma_report/lambda.py:386-441;
get_inventory_report :165-182; resource-type fan-out :185-204, 394-401).

The reference's shape: one inventory scan grouped by service, then a
SERIAL per-service HTTP fan-out grouped by resource type, pd.concat of all
frames, fillna(0). Spark-first collapse: the fan-out IS a finer-grained
group-by — one scan aggregated at (service) and at (service, resource
type), unioned by name. No N+1 loop, no driver-side accumulation, and the
warm-container duplicate-append defect (§2.5.1) is structurally impossible
because the run is a pure function of (sf_dir, run_date).

Here 'service' ~ p_type and 'resource type' ~ p_brand over the synthetic
part table; failed/passed are p_size-derived so the report shape (failed/
passed/total + resourceIdentity + transaction_date) matches A1/A1b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from ..operators.relational import union_all


def inventory_report(spark: SparkSession, sf_dir: str,
                     run_date: str = "2024-02-01") -> DataFrame:
    """Service-level inventory (A1 shape; P:165-182)."""
    p = tables.load(spark, sf_dir, "part")
    failed = F.sum(F.when(F.col("p_size") < 25, 1).otherwise(0))
    return (p.groupBy(F.col("p_type").alias("serviceName"))
            .agg(F.count("*").alias("totalResources"),
                 failed.alias("failedResources"),
                 (F.count("*") - failed).alias("passedResources"))
            .withColumn("transaction_date", F.lit(run_date)))


def resource_type_report(spark: SparkSession, sf_dir: str,
                         run_date: str = "2024-02-01") -> DataFrame:
    """Per-service resource-type fan-out (A1b shape; P:185-204,394-401) as
    ONE finer-grained aggregation instead of N serial scans; the literal
    resourceIdentity column mirrors P:201."""
    p = tables.load(spark, sf_dir, "part")
    failed = F.sum(F.when(F.col("p_size") < 25, 1).otherwise(0))
    return (p.groupBy(F.col("p_type").alias("serviceName"),
                      F.col("p_brand").alias("resourceTypeName"))
            .agg(F.count("*").alias("totalResources"),
                 failed.alias("failedResources"),
                 (F.count("*") - failed).alias("passedResources"))
            .withColumn("transaction_date", F.lit(run_date))
            .withColumn("resourceIdentity", F.lit("Resource Type")))


def inventory_run(spark: SparkSession, sf_dir: str,
                  run_date: str = "2024-02-01") -> DataFrame:
    """The full EP1 union (P:403-405): service rows + resource-type rows,
    aligned by NAME (pd.concat semantics), numeric nulls filled with 0."""
    combined = union_all([
        inventory_report(spark, sf_dir, run_date),
        resource_type_report(spark, sf_dir, run_date),
    ])
    return combined.na.fill(0)


INVENTORY_RUN_SQL = """
SELECT p_type AS serviceName,
       CAST(NULL AS VARCHAR) AS resourceTypeName,
       count(*) AS totalResources,
       CAST(sum(CASE WHEN p_size < 25 THEN 1 ELSE 0 END) AS BIGINT) AS failedResources,
       CAST(count(*) - sum(CASE WHEN p_size < 25 THEN 1 ELSE 0 END) AS BIGINT) AS passedResources,
       '2024-02-01' AS transaction_date,
       CAST(NULL AS VARCHAR) AS resourceIdentity
FROM part GROUP BY p_type
UNION ALL
SELECT p_type, p_brand, count(*),
       CAST(sum(CASE WHEN p_size < 25 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(*) - sum(CASE WHEN p_size < 25 THEN 1 ELSE 0 END) AS BIGINT),
       '2024-02-01', 'Resource Type'
FROM part GROUP BY p_type, p_brand
"""
