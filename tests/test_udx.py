"""UDF/UDAF/UDTF registration-surface tests (operators/udx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_udtf_chunks_partition_the_token_stream(spark):
    from tf_prisma_api_data_ingestion_spark.operators.udx import chunk_documents
    rows = [(1, "  one two  three four five "), (2, "a " * 120), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = chunk_documents(df, chunk_size=50).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: one chunk of 5 tokens; doc 2: 120 tokens -> 50/50/20
    assert [r.n_chunk_tokens for r in by_doc[1]] == [5]
    assert by_doc[1][0].chunk_text == "one two three four five"
    assert [r.n_chunk_tokens for r in by_doc[2]] == [50, 50, 20]
    assert [r.chunk_idx for r in by_doc[2]] == [0, 1, 2]
    # empty / null docs yield no rows
    assert 3 not in by_doc and 4 not in by_doc


def test_pandas_udaf_matches_decimal_sum(spark):
    from tf_prisma_api_data_ingestion_spark.operators.udx import micro_sum_udaf
    rows = [("a", 1.25), ("a", 2.5), ("a", 0.000001), ("b", -3.75)]
    df = spark.createDataFrame(rows, "event_type STRING, value DOUBLE")
    got = {r.event_type: (r.n_events, r.sum_value)
           for r in micro_sum_udaf(df).collect()}
    assert got == {"a": (3, 3.750001), "b": (1, -3.75)}
