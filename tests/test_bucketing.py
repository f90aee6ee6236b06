"""Bucketing: co-located joins with NO shuffle exchange — the 'bucketing
for co-located joins' scale strategy from the design brief. Both sides
are written bucketed by the join key with the same bucket count; the
sort-merge join then reads buckets directly (zero Exchange nodes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # tables land in ./spark-warehouse (warehouse.dir is a static conf);
    # gitignored, dropped after the module
    from tf_prisma_api_data_ingestion_spark import tables
    sf = "/root/testdata/sf0.001"
    (tables.load(spark, sf, "orders")
     .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (tables.load(spark, sf, "lineitem")
     .withColumnRenamed("l_orderkey", "o_orderkey")
     .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    orders, lineitem = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (lineitem.join(orders, "o_orderkey")
             .groupBy("o_orderstatus").agg(F.count("*").alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself shuffles NEITHER side (bucket layout satisfies
        # the distribution requirement); the only exchange is the final
        # small aggregation's
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else ""
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # result matches the plain (unbucketed) join
        from tf_prisma_api_data_ingestion_spark import tables
        sf = "/root/testdata/sf0.001"
        want = (tables.load(spark, sf, "lineitem")
                .join(tables.load(spark, sf, "orders"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus").agg(F.count("*").alias("n")))
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
