"""Round-5 behaviors: asof_join tie determinism, the variant-json
type-drift guard (Spark vs DuckDB agreement), and the bounded-memory
KMV bottom-k rewrite."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tf_prisma_api_data_ingestion_spark.operators.relational import asof_join


def test_asof_join_tiebreak_backward_greatest_wins(spark):
    left = spark.createDataFrame([(1, "u", 10)], "lid INT, k STRING, ts LONG")
    right = spark.createDataFrame(
        [("u", 10, 1.0, 1), ("u", 10, 2.0, 3), ("u", 10, 9.0, 2), ("u", 5, 7.0, 9)],
        "k STRING, ts LONG, val DOUBLE, rid INT")
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_cols={"val": "v"}, tiebreak=["rid"]).collect()
    # three right rows tie at ts=10; the greatest rid (3) wins -> val 2.0
    assert [(r.lid, r.v) for r in got] == [(1, 2.0)]


def test_asof_join_tiebreak_forward_greatest_wins(spark):
    left = spark.createDataFrame([(1, "u", 7)], "lid INT, k STRING, ts LONG")
    right = spark.createDataFrame(
        [("u", 10, 1.0, 1), ("u", 10, 2.0, 3), ("u", 12, 8.0, 9)],
        "k STRING, ts LONG, val DOUBLE, rid INT")
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_cols={"val": "v"}, direction="forward",
                    tiebreak=["rid"]).collect()
    # nearest following ts is 10 (twice); greatest rid wins -> val 2.0
    assert [(r.lid, r.v) for r in got] == [(1, 2.0)]


def test_asof_join_tiebreak_does_not_leak_columns(spark):
    left = spark.createDataFrame([(1, "u", 10)], "lid INT, k STRING, ts LONG")
    right = spark.createDataFrame(
        [("u", 9, 1.0, 5)], "k STRING, ts LONG, val DOUBLE, rid INT")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_cols={"val": "v"}, tiebreak=["rid"])
    assert set(out.columns) == {"lid", "k", "ts", "v"}


def _drifted_events(tmp_path) -> str:
    """An events table (contract schema) whose props.$.k drifts across
    JSON types: ints survive, booleans/floats/strings-of-floats null."""
    props = ['{"k": 5}', '{"k": true}', '{"k": 12.5}', '{"k": "7"}',
             '{"k": -3}', '{"k": false}', '{"k": [1]}', '{"k": "x"}',
             'not json', None, '{"x": 1}', '{"k": 99999999999999}']
    pdf = pd.DataFrame({
        "event_id": range(len(props)),
        "ts": pd.to_datetime(["2024-01-01"] * len(props)).astype("datetime64[us]"),
        "user_id": [1] * len(props),
        "event_type": ["click"] * len(props),
        "value": [1.0] * len(props),
        "props": props,
    })
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


def test_variant_json_guard_matches_duckdb_under_type_drift(spark, tmp_path):
    """ADVICE r4: Spark's variant int cast maps true->1 / 12.5->12 where
    the oracle's TRY_CAST yields NULL. The integer-literal guard must
    make both engines produce the SAME buckets on drifted data."""
    from tf_prisma_api_data_ingestion_spark.catalog import (
        SQL_OP_VARIANT_JSON,
        q_op_variant_json,
    )
    d = _drifted_events(tmp_path)
    got = {(r.k_bucket, r.n, r.sum_k)
           for r in q_op_variant_json(spark, d).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    exp = set(map(tuple, con.execute(SQL_OP_VARIANT_JSON).fetchall()))
    assert got == exp
    # surviving values are exactly the integer literals: 5, "7" (JSON
    # string of an int literal extracts identically in both engines),
    # and -3; true/false/12.5/[1]/"x"/overflow all null out. Both
    # engines' % keeps the dividend's sign, so -3 % 10 = -3.
    buckets = {b for b, _, _ in got if b is not None}
    assert buckets == {5, 7, -3}


def test_kmv_rewrite_matches_oracle_sf001(spark):
    """The windowed bottom-k formulation must be value-identical to the
    DuckDB oracle (same as the old collect_list formulation)."""
    from tf_prisma_api_data_ingestion_spark import tables
    from tf_prisma_api_data_ingestion_spark.catalog import (
        SQL_SKETCH_KMV_DISTINCT,
        SQL_SKETCH_KMV_UNION,
        q_sketch_kmv_distinct,
        q_sketch_kmv_union,
    )
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got_d = {(r.event_type, r.distinct_est)
             for r in q_sketch_kmv_distinct(spark, sf).collect()}
    exp_d = set(map(tuple, con.execute(SQL_SKETCH_KMV_DISTINCT).fetchall()))
    assert got_d == exp_d
    got_u = [tuple(r) for r in q_sketch_kmv_union(spark, sf).collect()]
    exp_u = [tuple(r) for r in con.execute(SQL_SKETCH_KMV_UNION).fetchall()]
    assert got_u == exp_u
