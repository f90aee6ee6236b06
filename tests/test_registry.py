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


def test_catalog_split_stays_under_size_budget():
    """r8 split the single-file catalog into four modules behind the
    catalog facade; this guard keeps any of them from regrowing past
    the 4k-line budget the split exists to enforce."""
    import pathlib

    import tf_prisma_api_data_ingestion_spark as pkg
    root = pathlib.Path(pkg.__file__).parent
    for mod in ("catalog_queries", "catalog_registry",
                "catalog_oracles", "catalog_oracles2"):
        n = len((root / f"{mod}.py").read_text().splitlines())
        assert n < 4000, f"{mod}.py has {n} lines (budget 4000)"


def test_catalog_facade_reexports_both_sides():
    """External code imports everything through .catalog — the split is
    layout, not API. Spot-pin one name per underlying module."""
    from tf_prisma_api_data_ingestion_spark.catalog import (  # noqa: F401
        ORACLES as _o,
        QUERIES as _q,
        SQL_OP_WMA,
        q_pd_filter_eq,
        q_plan_kmeans_train,
    )
    assert "plan-kmeans-train" in _q and "plan-kmeans-train" in _o
