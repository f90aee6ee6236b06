"""Report pipelines — the reference's end-to-end query shapes, Spark-first.

EP3, the alert report (get_alert_report, /root/reference/modules/src/
prisma_report/lambda.py:210-369), is the reference's only multi-stage
query: filter -> group-count -> project/rename/upper/lit -> fillna ->
sort. ``alert_report_events`` runs that exact shape over the synthetic
``events`` table (events ~ alerts: event_type ~ policy, user_id ~
account), as a pure function of (sf_dir, time window) — no mutable
globals, so reruns are idempotent (fixes SURVEY §2.5.1).

The reference's N+1 per-policy pagination loop (P:256-318) collapses
into one scan: grouping by event_type in a single aggregation IS the
per-policy fan-out, executed with map-side partial aggregation instead
of serial HTTP calls — the 100 TB-shaped formulation.

``alert_report_from_fixtures`` runs the same stages over reference-shaped
JSON fixtures (FIXTURES.md A2/A3) for the end-to-end tests; the policy
list joins to alerts via an explicit **broadcast** join, replacing the
reference's N+1 loop (SURVEY §3 EP3 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from ..operators.relational import fill_nulls, group_agg_count, project_rename, sort_desc

# Jan 2024 month window (events.ts is TIMESTAMP post-load; see tables.load)
_JAN_LO = "2024-01-01 00:00:00"
_FEB_LO = "2024-02-01 00:00:00"


def alert_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3-shaped alert report over the events table (see module doc)."""
    ev = tables.load(spark, sf_dir, "events")
    # stage 1-2: one filtered scan replaces policy-list + N+1 pagination;
    # timestamp-literal bounds push into the parquet scan (P:218-244's
    # month window, computed here as constants so runs stay pure)
    month = ev.filter((F.col("ts") >= F.to_timestamp(F.lit(_JAN_LO)))
                      & (F.col("ts") < F.to_timestamp(F.lit(_FEB_LO))))
    # stage 3: group + count + deterministic "first" (min, not first-seen)
    grouped = group_agg_count(
        month, ["event_type", "user_id"],
        {"failed_resource_count": F.count("*"),
         "first_event_id": F.min("event_id")})
    # stage 4: project/rename to report columns, upper(), lit('fail')
    report = project_rename(grouped, {
        "Policy Name": F.concat(F.lit("policy-"), F.col("event_type")),
        "Policy Severity": F.upper(F.col("event_type")),
        "Cloud Account Name": F.concat(F.lit("acct-"), F.col("user_id")),
        "Status": F.lit("fail"),
        "Failed Resource Count": F.col("failed_resource_count"),
        "first_event_id": F.col("first_event_id"),
    })
    # stage 5: fillna + run-metadata literals + sort
    report = fill_nulls(report, 0)
    report = report.withColumn("transaction_date", F.lit("2024-02-01"))
    return sort_desc(report, ["Policy Severity", "Failed Resource Count"],
                     tiebreak=["Cloud Account Name"])


ALERT_REPORT_EVENTS_SQL = """
WITH grouped AS (
  SELECT event_type, user_id,
         CAST(count(*) AS BIGINT) AS failed_resource_count,
         min(event_id) AS first_event_id
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-02-01 00:00:00'
  GROUP BY event_type, user_id
)
SELECT concat('policy-', event_type) AS "Policy Name",
       upper(event_type) AS "Policy Severity",
       concat('acct-', user_id) AS "Cloud Account Name",
       'fail' AS "Status",
       failed_resource_count AS "Failed Resource Count",
       first_event_id,
       '2024-02-01' AS transaction_date
FROM grouped
"""


def alert_report_from_fixtures(policies: DataFrame, alert_items: DataFrame) -> DataFrame:
    """EP3 over reference-shaped frames (FIXTURES.md A2/A3).

    ``policies``: policyId, policyName, policyType, severity (small).
    ``alert_items``: policyId, resource struct<account, accountId,
    cloudType, cloudAccountGroups array<string>>.

    One alerts scan + broadcast join to the tiny policy frame replaces
    the reference's per-policy pagination loop (P:256-318). Null-safe
    element_at replaces the IndexError-prone [0] (P:324, §2.5.6).
    """
    grouped = (alert_items
               .groupBy("policyId", F.col("resource.account").alias("account"))
               .agg(F.count("*").alias("failed_resource_count"),
                    F.min("resource.accountId").alias("accountId"),
                    F.min("resource.cloudType").alias("cloudType"),
                    F.min(F.when(F.size("resource.cloudAccountGroups") >= 1,
                                 F.element_at("resource.cloudAccountGroups", 1))
                          ).alias("accountGroup")))
    joined = grouped.join(F.broadcast(policies), "policyId")
    return joined.select(
        F.col("policyName").alias("Policy Name"),
        F.col("policyType").alias("Policy Type"),
        F.upper("severity").alias("Policy Severity"),
        F.upper("cloudType").alias("Cloud Type"),
        F.col("account").alias("Cloud Account Name"),
        F.col("accountId").alias("Cloud Account Id"),
        F.col("accountGroup").alias("Cloud Account Group"),
        F.lit("fail").alias("Status"),
        F.col("failed_resource_count").alias("Failed Resource Count"),
    ).na.fill(0)
