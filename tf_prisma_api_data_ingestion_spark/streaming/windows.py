"""Windowed streaming aggregation over the events table (SURVEY §7.5).

The reference has no streaming path (its ingestion is a scheduled Lambda,
§2.4); this is the Structured Streaming formulation of the same
"aggregate events per bucket" semantics: file micro-batch source ->
event-time window + watermark -> windowed aggregate.

Scale notes:
- The file source lists + reads incrementally; on a cluster the same code
  points at an object-store prefix or Kafka with no plan change.
- Watermark bounds the aggregation state store: late rows beyond the
  watermark are dropped instead of growing state forever — the property
  that keeps an always-on 100 TB/day stream's memory flat.
- ``availableNow`` drains everything currently available then stops —
  the batch-parity mode used by the oracle-differential check
  (catalog.py stream-window-agg) and incremental backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# explicit contract (§1.3): ts is LONG because events.parquet stores
# TIMESTAMP(NANOS) and the session reads nanos-as-long (see tables.load)
EVENTS_SCHEMA = ("event_id LONG, ts LONG, user_id LONG, event_type STRING, "
                 "value DOUBLE, props STRING")


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # self-defending confs (the driver's session may have neither): nanos
    # parquet readability + UTC so formatted window bounds match the
    # timezone-naive oracle even when this is the first query to run
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    return stream.withColumn("ts_t", F.timestamp_micros(F.expr("ts DIV 1000")))


def windowed_event_counts(spark: SparkSession, sf_dir: str,
                          window: str = "1 hour",
                          watermark: str = "10 minutes",
                          query_name: str = "windowed_event_counts") -> DataFrame:
    """Tumbling-window count + exact-decimal value sum per event_type,
    drained with availableNow into an in-memory sink and returned as a
    finished DataFrame.

    Complete output mode: every window is emitted on drain (append mode
    would hold back windows the final watermark hasn't passed — that
    variant is exercised in tests/test_streaming.py).
    """
    agg = (_event_stream(spark, sf_dir)
           .withWatermark("ts_t", watermark)
           .groupBy(F.window("ts_t", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value")))
    q = (agg.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    # window start as a formatted string: engine-neutral for the oracle
    # hash (raw timestamps surface as ns vs µs pandas dtypes)
    return (spark.table(query_name)
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                     .alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def stateful_running_totals(spark: SparkSession, sf_dir: str,
                            query_name: str = "stateful_totals") -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-event-type running (count, exact decimal sum) carried in explicit
    GroupState across micro-batches, emitted in update mode.

    This is the escape hatch for aggregation logic Spark's built-in
    windowed aggs can't express (per-key state machines, custom eviction);
    here the logic is deliberately oracle-reproducible so the driver's
    hash check covers the API path end to end.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total_micro = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # exact accumulation: values are 6-decimal, so sum in integer
            # micro-units (pandas float sums would drift vs the oracle)
            total_micro += int(round(pdf["value"].map(
                lambda v: int(round(v * 1_000_000))).sum()))
        state.update((n, total_micro))
        yield pd.DataFrame({"event_type": [key[0]], "n_events": [n],
                            "sum_value": [total_micro / 1_000_000]})

    stream = _event_stream(spark, sf_dir)
    out = (stream.groupBy("event_type")
           .applyInPandasWithState(
               update,
               outputStructType="event_type STRING, n_events LONG, sum_value DOUBLE",
               stateStructType="n LONG, total_micro LONG",
               outputMode="update",
               timeoutConf=GroupStateTimeout.NoTimeout))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # update mode emits one row per key per micro-batch; running totals
    # only grow, so the final state row per key is the max_by(n_events)
    return (spark.table(query_name).groupBy("event_type")
            .agg(F.max("n_events").alias("n_events"),
                 F.max_by("sum_value", "n_events").alias("sum_value")))


def sliding_event_counts(spark: SparkSession, sf_dir: str,
                         window: str = "1 hour", slide: str = "30 minutes",
                         watermark: str = "10 minutes",
                         query_name: str = "sliding_event_counts") -> DataFrame:
    """Sliding-window variant: each event lands in window/slide buckets."""
    agg = (_event_stream(spark, sf_dir)
           .withWatermark("ts_t", watermark)
           .groupBy(F.window("ts_t", window, slide).alias("w"), "event_type")
           .agg(F.count("*").alias("n_events")))
    q = (agg.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(query_name)
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                     .alias("window_start"), "event_type",
                    "n_events"))


def session_event_counts(spark: SparkSession, sf_dir: str,
                         gap: str = "30 minutes",
                         watermark: str = "10 minutes",
                         query_name: str = "session_event_counts") -> DataFrame:
    """Session-window streaming aggregation: per-user sessions that merge
    events separated by less than ``gap`` (dynamic, data-defined windows —
    the third window family after tumbling and sliding).

    Session state merges adjacent windows as events arrive; the watermark
    is what lets Spark finalize (and evict) sessions whose close time has
    passed — unbounded user counts stay bounded in the state store.
    Complete mode on an availableNow drain emits every session, which is
    what the batch gap-and-islands oracle reproduces.
    """
    agg = (_event_stream(spark, sf_dir)
           .withWatermark("ts_t", watermark)
           .groupBy(F.session_window("ts_t", gap).alias("w"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value")))
    q = (agg.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(query_name)
            .select("user_id",
                    F.unix_timestamp("w.start").alias("session_start_sec"),
                    "n_events", "sum_value"))
