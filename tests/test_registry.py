"""Registry integrity — fast, no SparkSession: every driver-facing query
key must be oracle-paired (the repo's central correctness claim), the
driver window must be full, and key sets must not collide."""

from __future__ import annotations

from tf_prisma_api_data_ingestion_spark.catalog import (
    ORACLES,
    QUERIES,
    THROUGHPUT_QUERIES,
)


def test_every_query_key_has_an_oracle():
    missing = [k for k in QUERIES if k not in ORACLES]
    assert not missing, f"keys without a DuckDB oracle: {missing}"


def test_no_orphan_oracles():
    orphans = [k for k in ORACLES if k not in QUERIES]
    assert not orphans, f"oracles without a query: {orphans}"


def test_driver_window_is_full():
    # the driver's correctness gate checks exactly the first 50 keys
    assert len(QUERIES) >= 50


def test_throughput_twins_do_not_shadow_gated_keys():
    overlap = set(QUERIES) & set(THROUGHPUT_QUERIES)
    assert not overlap, f"keys in both registries: {overlap}"


def test_oracle_sql_is_nonempty_ansi_text():
    for k, sql in ORACLES.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), k
