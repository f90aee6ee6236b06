"""Schema-drift canary (VERDICT r3 item 2): the round-3 testdata
regeneration silently changed events.ts from TIMESTAMP(NANOS) to
timestamp[us] and broke 18 queries. These tests fail loudly — with the
observed diff — if the testdata contract moves again, and pin the
loader's normalization for both physical generations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def test_testdata_schema_contract(spark):
    from tf_prisma_api_data_ingestion_spark import tables
    tables.assert_contract(spark, SF)


def test_events_ts_normalized_to_timestamp(spark):
    from tf_prisma_api_data_ingestion_spark import tables
    ev = tables.load(spark, SF, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    # generator writes Jan 2024 events; a unit slip (ns read as µs, µs as
    # ns, s as ms...) lands decades away from this window
    assert lo.year == 2024 and hi.year == 2024


def test_loader_accepts_legacy_nanos_long(spark, tmp_path):
    """The legacy generation (TIMESTAMP(NANOS), surfaced as nanos-long
    under spark.sql.legacy.parquet.nanosAsLong) must normalize to the
    same canonical TIMESTAMP."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tf_prisma_api_data_ingestion_spark import tables

    us = 1704844800 * 10**6 + 123456  # 2024-01-10 00:00:00.123456
    t = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([us * 1000], pa.timestamp("ns")),
        "user_id": pa.array([7], pa.int64()),
        "event_type": pa.array(["click"], pa.string()),
        "value": pa.array([1.5], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    })
    sf_dir = str(tmp_path)
    pq.write_table(t, f"{sf_dir}/events.parquet",
                   coerce_timestamps=None, use_deprecated_int96_timestamps=False)
    ev = tables.load(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    assert ev.select(F.unix_micros("ts")).first()[0] == us


def test_streaming_accepts_legacy_nanos_long(spark, tmp_path):
    """The streaming reader must branch on the physical ts type like
    tables.load: a legacy TIMESTAMP(NANOS) file streams into the same
    canonical ts/ts_t TIMESTAMP contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tf_prisma_api_data_ingestion_spark.streaming.windows import (
        upsert_latest_state,
    )

    us = 1704844800 * 10**6
    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([us * 1000, (us + 5) * 1000], pa.timestamp("ns")),
        "user_id": pa.array([7, 7], pa.int64()),
        "event_type": pa.array(["click", "view"], pa.string()),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string()),
    })
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "events_nanos.parquet"))
    final = upsert_latest_state(
        spark, str(src), str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
        query_name="t_legacy_nanos", glob="*.parquet")
    row = final.select("user_id", F.unix_micros("ts").alias("us"),
                       "event_type").first()
    assert (row.user_id, row.us, row.event_type) == (7, us + 5, "view")


def test_event_ts_us_helper(spark):
    """event_ts_us must produce the exact epoch-µs value, checked against
    an independently-known instant (not against unix_micros of the same
    column, which would be tautological)."""
    from tf_prisma_api_data_ingestion_spark import tables
    df = spark.sql(
        "SELECT TIMESTAMP '2024-01-10 00:00:00.123456' AS ts")
    got = df.select(tables.event_ts_us().alias("us")).first().us
    assert got == 1704844800 * 10**6 + 123456


def test_mutated_schema_fixture_aborts_with_diff(spark, tmp_path):
    """bench.py and scripts/selfcheck.py run assert_contract at startup:
    a regenerated-with-drift testdata dir must abort in seconds with the
    observed diff naming the drifted table, not crash mid-run."""
    import shutil

    import pandas as pd

    from tf_prisma_api_data_ingestion_spark import tables

    for t in ("region", "nation", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    tmp_path / f"{t}.parquet")
    # drifted generation: value became a string column
    pd.DataFrame({
        "event_id": [1], "ts": pd.to_datetime(["2024-01-10"]).astype("datetime64[us]"),
        "user_id": [1], "event_type": ["click"],
        "value": ["1.5"], "props": ["{}"],
    }).to_parquet(str(tmp_path / "events.parquet"), index=False)
    with pytest.raises(AssertionError, match="events"):
        tables.assert_contract(spark, str(tmp_path))
