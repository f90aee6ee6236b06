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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
