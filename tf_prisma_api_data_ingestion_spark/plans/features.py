"""Customer feature store — the composite a training pipeline materializes
before model fitting (north-star extension; no reference analog, the
reference stops at report CSVs — SURVEY.md §7.5).

One wide per-customer feature table from customers + orders + lineitem:
RFM (recency / frequency / monetary), order-shape features, the modal
order priority, an empirical-Bayes target encoding of the market segment,
and an activity label — every column deterministic (exact integer sums,
integer-space rounding, deterministic tie-breaks) so backfills and
retrains produce the identical table and the DuckDB oracle replays it
hash-for-hash.

Scale design: everything is a groupBy on the natural keys (custkey /
orderkey) — map-side-combinable aggregations plus ONE shuffle join of
lineitem against orders' (orderkey -> custkey) projection; the
target-encoding and global-max-date frames are 1-to-25-row broadcasts.
No window touches a row-scale frame (the modal-priority window partitions
by customer over the tiny cust x priority counts). At 100 TB: lineitem ->
orders is the canonical co-partitioned join (bucket both by orderkey and
it degenerates to a local zip); nothing else shuffles more than
|customers| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.ml import target_encode

URGENT = ("1-URGENT", "2-HIGH")


def customer_feature_store(customers: DataFrame, orders: DataFrame,
                           lineitem: DataFrame,
                           active_cutoff: str = "1997-01-01",
                           smoothing: float = 20.0) -> DataFrame:
    """Returns one row per customer:
    (c_custkey, mktsegment, frequency, monetary_cents, recency_days,
    avg_lines_r, fav_priority, seg_enc_r, label_active).

    Customers with no orders keep frequency 0, NULL recency/avg/priority,
    label_active 0 — the left-join semantics a feature store needs (a
    dropped inactive customer is silent training skew).

    avg_lines_r rounds in EXACT INTEGER space ((2S+n) DIV 2n — the
    text.lm_likelihood precedent) so no float tie can split the engines.
    """
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100) \
        .cast("decimal(18,0)")
    per_order = orders.select("o_orderkey", "o_custkey", "o_orderdate",
                              "o_orderpriority", cents.alias("_cents"))

    rfm = per_order.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.sum("_cents").cast("long").alias("monetary_cents"),
        F.max("o_orderdate").alias("_last"))

    # lineitem volume per customer: ONE shuffle join against the slim
    # (orderkey -> custkey) projection, then a combinable count
    lines = (lineitem.select("l_orderkey")
             .join(per_order.select("o_orderkey", "o_custkey"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_custkey")
             .agg(F.count(F.lit(1)).alias("_nlines")))

    # modal priority, ties to the lexicographically smallest priority —
    # a window over the tiny (customer x 5 priorities) count frame
    pc = per_order.groupBy("o_custkey", "o_orderpriority") \
                  .agg(F.count(F.lit(1)).alias("_pc"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("_pc").desc(), F.col("o_orderpriority").asc())
    fav = (pc.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select("o_custkey", F.col("o_orderpriority").alias("fav_priority")))

    # segment target encoding against the urgent-order label: the
    # encoder input is one order-grain join to pick up the segment
    seg_orders = per_order.join(
        customers.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"))
    te = target_encode(seg_orders, "c_mktsegment",
                       F.col("o_orderpriority").isin(*URGENT).cast("int"),
                       smoothing=smoothing) \
        .select(F.col("category"), F.col("enc_r").alias("seg_enc_r"))

    maxd = orders.agg(F.max("o_orderdate").alias("_maxd"))

    avg_scaled = F.expr(
        "CAST((2 * CAST(_nlines AS DECIMAL(38,0)) * 1000000 + frequency)"
        " DIV CAST(2 * frequency AS DECIMAL(38,0)) AS DOUBLE)")
    out = (customers.select("c_custkey", F.col("c_mktsegment").alias("mktsegment"))
           .join(rfm, F.col("c_custkey") == rfm["o_custkey"], "left")
           .drop("o_custkey")
           .join(lines, F.col("c_custkey") == lines["o_custkey"], "left")
           .drop("o_custkey")
           .join(fav, F.col("c_custkey") == fav["o_custkey"], "left")
           .drop("o_custkey")
           .join(F.broadcast(te), F.col("mktsegment") == te["category"], "left")
           .drop("category")
           .crossJoin(F.broadcast(maxd)))
    return (out.select(
                "c_custkey", "mktsegment",
                F.coalesce(F.col("frequency"), F.lit(0)).cast("long")
                 .alias("frequency"),
                F.coalesce(F.col("monetary_cents"), F.lit(0)).cast("long")
                 .alias("monetary_cents"),
                F.datediff(F.col("_maxd"), F.col("_last")).cast("long")
                 .alias("recency_days"),
                F.when(F.col("frequency").isNotNull(),
                       avg_scaled / F.lit(1000000.0)).alias("avg_lines_r"),
                "fav_priority",
                "seg_enc_r",
                F.when(F.col("_last") >= F.lit(active_cutoff), 1)
                 .otherwise(0).cast("int").alias("label_active"))
            .orderBy("c_custkey"))


def session_features(events: DataFrame, gap_us: int = 30 * 60 * 1_000_000
                     ) -> DataFrame:
    """Per-session behavioral feature table — the event-side sibling of
    the customer feature store: gap-based sessions (same gap-and-islands
    window as relational.sessionize) aggregated into the features a
    ranking / propensity model consumes, with the conversion label
    attached.

    Exactness: value sums accumulate in DECIMAL cents; the conversion
    flag and event-type counts are conditional integer counts; no float
    leaves the operator un-rounded (value_cents stays integer).

    Scale design: one window per user (the sessionize shuffle), one
    combinable aggregation per session — nothing else. Returns
    (user_id, session_id, session_start, session_end, duration_us,
    n_events, n_views, n_clicks, n_purchases, value_cents, converted).
    """
    w = Window.partitionBy("user_id").orderBy(F.col("_ts").asc())
    cents = (F.col("value").cast("decimal(18,2)") * 100) \
        .cast("decimal(18,0)")
    flagged = (events
               .select(F.col("user_id").cast("string").alias("user_id"),
                       F.unix_micros(F.col("ts")).alias("_ts"),
                       F.col("event_type").alias("_et"),
                       cents.alias("_cents"))
               .withColumn("_prev", F.lag("_ts").over(w))
               .withColumn("_new", F.when(
                   F.col("_prev").isNull()
                   | (F.col("_ts") - F.col("_prev") > gap_us), 1)
                   .otherwise(0)))
    wc = Window.partitionBy("user_id").orderBy(F.col("_ts").asc()) \
               .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    num = flagged.withColumn("session_id",
                             F.sum("_new").over(wc).cast("long"))
    et = lambda n: F.count(F.when(F.col("_et") == n, True))  # noqa: E731
    return (num.groupBy("user_id", "session_id")
               .agg(F.min("_ts").alias("session_start"),
                    F.max("_ts").alias("session_end"),
                    (F.max("_ts") - F.min("_ts")).alias("duration_us"),
                    F.count(F.lit(1)).alias("n_events"),
                    et("view").alias("n_views"),
                    et("click").alias("n_clicks"),
                    et("purchase").alias("n_purchases"),
                    F.sum("_cents").cast("long").alias("value_cents"),
                    (F.count(F.when(F.col("_et") == "purchase", True)) > 0)
                    .cast("int").alias("converted"))
               .orderBy("user_id", "session_id"))
