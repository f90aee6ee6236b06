"""Round-4 operators: Z-order layout, count-min sketch, range-frame
window, TPC-H widening plan shapes, streaming upsert merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- morton ---

def _morton_py(x: int, y: int) -> int:
    """Bit-by-bit reference interleave (independent of the bit-twiddling
    formulation under test)."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference(spark):
    from tf_prisma_api_data_ingestion_spark.operators.layout import morton_interleave
    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535),
             (65535, 65535), (12345, 54321), (70000, 2)]  # >16-bit masks down
    df = spark.createDataFrame([{"x": x, "y": y} for x, y in cases])
    out = {(r.x, r.y): r.z for r in
           df.select("x", "y", morton_interleave(F.col("x"), F.col("y"))
                     .alias("z")).collect()}
    for x, y in cases:
        assert out[(x, y)] == _morton_py(x & 0xFFFF, y & 0xFFFF), (x, y)


def test_zorder_locality(spark):
    """Contiguous z-ranges must cover bounded key rectangles: within each
    64th of the z-space, both keys' min/max spans stay far below the full
    domain (the property that makes min/max file stats prune on either
    key)."""
    from tf_prisma_api_data_ingestion_spark.catalog import q_op_zorder_layout
    stats = q_op_zorder_layout(spark, SF).collect()
    assert len(stats) >= 1
    for r in stats:
        # each z-range of 2^26 values covers a rectangle of at most
        # 2^13 x 2^13 of the 16-bit x 16-bit key space
        assert r.max_partkey - r.min_partkey <= 1 << 13
        assert r.max_suppkey - r.min_suppkey <= 1 << 13


def test_zorder_by_sorts_within_partitions(spark):
    from tf_prisma_api_data_ingestion_spark.operators.layout import zorder_by
    li = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_partkey", "l_suppkey").limit(2000)
    z = zorder_by(li, "l_partkey", "l_suppkey", n_files=4)
    ok = z.withColumn("_pid", F.spark_partition_id()) \
          .groupBy("_pid") \
          .agg((F.collect_list("_zval") == F.array_sort(F.collect_list("_zval")))
               .alias("sorted")) \
          .agg(F.every("sorted").alias("all_sorted")).collect()[0]
    assert ok.all_sorted


# ---------------------------------------------------------------- cms ---

def test_cms_never_underestimates(spark):
    """CMS estimates are upper bounds of true counts, and the reported
    top token matches the exact top token (collisions only inflate)."""
    from tf_prisma_api_data_ingestion_spark.catalog import q_sketch_cms_topk
    from tf_prisma_api_data_ingestion_spark.operators import text
    est = {r.token: r.est_count for r in q_sketch_cms_topk(spark, SF).collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet")
    true = {r.token: r.n for r in
            d.select(F.explode(text.tokens(F.col("text"))).alias("token"))
             .groupBy("token").agg(F.count("*").alias("n")).collect()}
    assert est, "cms returned no rows"
    for tok, e in est.items():
        assert e >= true[tok], f"CMS underestimated {tok}"
    top_exact = max(true.items(), key=lambda kv: (kv[1], kv[0]))[0]
    top_est = max(est.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert true[top_est] >= 0.5 * true[top_exact]


# --------------------------------------------------------- range frame ---

def test_range_frame_includes_simultaneous_rows(spark):
    """RANGE frames group by ORDER-BY value: two events with the same
    timestamp see each other's contribution (ROWS frames would not)."""
    rows = [(1, 10, 0, 1.0), (2, 10, 0, 2.0),          # simultaneous
            (3, 10, 3_600_000_000, 4.0),               # exactly 1h later
            (4, 10, 7_200_000_001, 8.0),               # out of range of all
            (5, 11, 0, 16.0)]                          # other user
    df = spark.createDataFrame(rows, "event_id LONG, user_id LONG, ts_us LONG, value DOUBLE")
    from pyspark.sql.window import Window
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-3_600_000_000, 0))
    out = {r.event_id: r.s for r in
           df.withColumn("s", F.sum("value").over(w)).collect()}
    assert out[1] == out[2] == 3.0          # both rows share the frame
    assert out[3] == 7.0                    # 1h-ago rows still inside
    assert out[4] == 8.0                    # everything else aged out
    assert out[5] == 16.0                   # partition isolation


# ----------------------------------------------------------- tpch plans ---

def test_q4_plan_is_semi_join(spark):
    from tf_prisma_api_data_ingestion_spark.catalog import q_tpch_q4
    plan = q_tpch_q4(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_q15_matches_manual_max(spark):
    from tf_prisma_api_data_ingestion_spark.catalog import q_tpch_q15
    rows = q_tpch_q15(spark, SF).collect()
    assert len(rows) >= 1
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))))
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,6)")).cast("double").alias("r")))
    mx = rev.agg(F.max("r")).collect()[0][0]
    for r in rows:
        assert r.total_revenue == mx


# ------------------------------------------------- runtime bloom filter ---

def test_runtime_bloom_filter_injection(spark):
    """Catalyst injects a runtime bloom filter built from the selective
    join side into the fact scan (shuffle joins only — locally the scan
    threshold must drop to trigger what a 100 TB scan triggers by size).
    The filtered plan must stay result-identical to the plain join."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = (spark.read.parquet(f"{SF}/orders.parquet")
             .filter(F.col("o_orderstatus") == "P"))
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), "no runtime bloom filter injected"
        n_bloom = j.count()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .filter(F.col("o_orderstatus") == "P"))
    assert n_bloom == li.join(o, li.l_orderkey == o.o_orderkey).count()


# ------------------------------------------------------ streaming upsert ---

def test_upsert_merges_across_runs(spark, tmp_path):
    """Second run over a NEW source file must merge: keys only in run 1
    survive, keys in both runs take the later event."""
    from tf_prisma_api_data_ingestion_spark.streaming.windows import upsert_latest_state
    src = tmp_path / "src"
    src.mkdir()
    tgt, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    batch1 = [(1, 100, 10, "click", 1.0), (2, 200, 20, "view", 2.0)]
    batch2 = [(3, 300, 10, "purchase", 3.0), (4, 50, 30, "click", 4.0)]
    schema = "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"

    def write(batch, mode):
        (spark.createDataFrame([r + (None,) for r in batch], schema)
         .withColumn("ts", F.timestamp_micros("ts"))  # canonical contract
         .coalesce(1).write.mode(mode).parquet(str(src / "b1")))

    write(batch1, "errorifexists")
    upsert_latest_state(spark, str(src / "b1"), tgt, ckpt,
                        query_name="up_t1", glob="*.parquet")
    write(batch2, "append")
    final = upsert_latest_state(spark, str(src / "b1"), tgt, ckpt,
                                query_name="up_t2", glob="*.parquet")
    state = {r.user_id: (r.event_id, r.ts_us, r.event_type)
             for r in final.withColumn("ts_us", F.unix_micros("ts")).collect()}
    assert state[10] == (3, 300, "purchase")   # later ts wins
    assert state[20] == (2, 200, "view")       # untouched key survives
    assert state[30] == (4, 50, "click")       # new key inserted
