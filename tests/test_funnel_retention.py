"""Semantics pins for op-funnel / op-retention (catalog.py): strict
ordering between funnel stages, NULL propagation when a stage never
happens, and cohort/day-offset bucketing."""

from __future__ import annotations

import os
import tempfile

import pytest


def _write_events_file(rows, path):
    """Write (user_id, event_type, ts_string) rows as ONE parquet FILE
    with the testdata events schema (timestamp[us] naive) — the
    streaming source's pathGlobFilter matches leaf file names, so
    fixtures must be single files like the driver's testdata, not
    directory writes."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "user_id": [u for u, _, _ in rows],
        "event_type": [t for _, t, _ in rows],
        "ts": pd.to_datetime([ts for _, _, ts in rows]).astype(
            "datetime64[us]"),
        "value": 1.0,
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def _events(spark, rows):
    # rows: (user_id, event_type, ts_string)
    df = spark.createDataFrame(
        [(i, u, t, ts) for i, (u, t, ts) in enumerate(rows)],
        "event_id LONG, user_id LONG, event_type STRING, ts_s STRING")
    from pyspark.sql import functions as F
    return (df.select("event_id", "user_id", "event_type",
                      F.to_timestamp("ts_s").alias("ts"),
                      F.lit(1.0).alias("value"),
                      F.lit("{}").alias("props")))


@pytest.fixture()
def funnel_dir(spark, tmp_path):
    rows = [
        # u1 full funnel in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:01:00"),
        (1, "purchase", "2024-01-01 00:02:00"),
        # u2: click BEFORE the first view -> funnel stops at view
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 00:01:00"),
        # u3: click at the SAME instant as the view -> strictly-after
        # semantics: does not advance
        (3, "view", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-01 00:00:00"),
        # u4: purchase before click -> depth 2 (view+click only)
        (4, "view", "2024-01-01 00:00:00"),
        (4, "purchase", "2024-01-01 00:00:30"),
        (4, "click", "2024-01-01 00:01:00"),
        # u5: never views -> depth 0
        (5, "click", "2024-01-01 00:00:00"),
        (5, "purchase", "2024-01-01 00:01:00"),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    _write_events_file(rows, f"{d}/events.parquet")
    return d


def test_funnel_depths(spark, funnel_dir):
    from tf_prisma_api_data_ingestion_spark.catalog import q_op_funnel
    got = {r.user_id: r for r in q_op_funnel(spark, funnel_dir).collect()}
    assert got[1].funnel_depth == 3
    assert got[2].funnel_depth == 1          # click preceded first view
    assert got[3].funnel_depth == 1          # simultaneous click ignored
    assert got[4].funnel_depth == 2          # purchase preceded click
    assert got[5].funnel_depth == 0
    assert got[5].t_view is None and got[5].t_click is None
    # u4's click is recorded even though the purchase came earlier
    assert got[4].t_click is not None and got[4].t_purchase is None


def test_funnel_timestamps_are_first_qualifying(spark, funnel_dir):
    from tf_prisma_api_data_ingestion_spark.catalog import q_op_funnel
    got = {r.user_id: r for r in q_op_funnel(spark, funnel_dir).collect()}
    r = got[1]
    assert r.t_click - r.t_view == 60_000_000        # 1 min in µs
    assert r.t_purchase - r.t_click == 60_000_000


def test_retention_matrix(spark, tmp_path):
    rows = [
        # cohort A (2024-01-01): u1 active d0, d1; u2 active d0, d2
        (1, "view", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-02 10:00:00"),
        (2, "click", "2024-01-01 09:00:00"),
        (2, "click", "2024-01-03 09:00:00"),
        # two events same user same day collapse to one active day
        (2, "view", "2024-01-03 23:00:00"),
        # cohort B (2024-01-02): u3 active d0 only
        (3, "view", "2024-01-02 00:00:00"),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    from tf_prisma_api_data_ingestion_spark.catalog import q_op_retention
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in q_op_retention(spark, d).collect()}
    assert got[("2024-01-01", 0)] == 2    # u1+u2 on day 0
    assert got[("2024-01-01", 1)] == 1    # u1 back next day
    assert got[("2024-01-01", 2)] == 1    # u2 back on day 2 (once)
    assert got[("2024-01-02", 0)] == 1    # u3's own cohort
    assert ("2024-01-02", 1) not in got


def test_streaming_funnel_matches_batch_on_tricky_cases(spark, funnel_dir):
    from tf_prisma_api_data_ingestion_spark.catalog import q_op_funnel
    from tf_prisma_api_data_ingestion_spark.streaming.windows import (
        streaming_funnel,
    )
    batch = {r.user_id: (r.t_view, r.t_click, r.t_purchase, r.funnel_depth)
             for r in q_op_funnel(spark, funnel_dir).collect()}
    stream = {r.user_id: (r.t_view, r.t_click, r.t_purchase, r.funnel_depth)
              for r in streaming_funnel(
                  spark, funnel_dir,
                  query_name="t_stream_funnel").collect()}
    assert stream == batch


def test_streaming_funnel_out_of_order_batches(spark, tmp_path):
    # clicks/purchases land in the FIRST micro-batch, the qualifying
    # view only in the SECOND (maxFilesPerTrigger=1 forces two batches):
    # the candidate-set state must retroactively resolve the full funnel
    import os
    import time
    d = str(tmp_path / "sf"); os.makedirs(d, exist_ok=True)
    _write_events_file([
        (1, "click", "2024-01-01 00:01:00"),
        (1, "purchase", "2024-01-01 00:02:00"),
    ], f"{d}/events_a.parquet")
    time.sleep(1.1)  # distinct mtimes: the file source orders batches
    _write_events_file([
        (1, "view", "2024-01-01 00:00:00"),
    ], f"{d}/events_b.parquet")
    from tf_prisma_api_data_ingestion_spark.streaming.windows import (
        streaming_funnel,
    )
    got = streaming_funnel(spark, d, query_name="t_stream_funnel_ooo",
                           max_files_per_trigger=1,
                           glob="events_*.parquet").collect()
    assert len(got) == 1
    r = got[0]
    assert r.funnel_depth == 3
    assert r.t_click - r.t_view == 60_000_000
