"""Loaders for the driver-provided synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under /root/testdata/sf*/.

We read with explicit paths (no catalog) and rely on Catalyst for column
pruning / predicate pushdown into the parquet scan. At 100 TB these would
be partitioned/bucketed external tables; the loader API stays the same.

Schema normalization (the §1.3 inversion, applied to OUR inputs): the
testdata generator has shipped ``events.ts`` as both parquet
TIMESTAMP(NANOS) (read by Spark 4 as nanos-long under
``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]``.
``load`` detects the physical type and always emits a canonical
``ts: TIMESTAMP`` column (UTC session), so every consumer — batch,
streaming, and the DuckDB oracle (``epoch_us(ts)``) — sees one contract
regardless of which generation wrote the file. ``assert_contract`` is the
loud canary: it fails with the observed diff if the testdata schema
drifts again.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Canonical post-load events schema: ts is TIMESTAMP no matter how the
# parquet stored it. Field order matches the generator's layout.
EVENTS_FIELDS = (
    ("event_id", T.LongType()),
    ("ts", T.TimestampType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
)


def _events_read_schema() -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in EVENTS_FIELDS])


def events_ddl(legacy_nanos: bool = False) -> str:
    """The canonical events read schema as DDL, for readers that must
    supply one (the streaming file source). ``legacy_nanos=True`` swaps
    ts to LONG — the physical shape of the TIMESTAMP(NANOS) generation
    under nanosAsLong; convert with ``normalize_legacy_ts``. ONE source
    of truth (EVENTS_FIELDS) for every reader, so the next schema drift
    is a one-place fix."""
    def ddl(n, t):
        if n == "ts" and legacy_nanos:
            return "ts LONG"
        return f"{n} {t.simpleString().upper()}"
    return ", ".join(ddl(n, t) for n, t in EVENTS_FIELDS)


def normalize_legacy_ts(df: DataFrame) -> DataFrame:
    """nanos-long ts -> canonical TIMESTAMP. Integer DIV keeps full
    precision — a double division loses bits above 2^53 (epoch-nanos is
    ~1.7e18)."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    # Defensive session confs (runtime-settable), because the DRIVER
    # supplies its own session without session.get_spark's settings:
    # - UTC: date_format/strftime parity with the (timezone-naive) DuckDB
    #   oracle; otherwise formatted timestamps shift by the host zone.
    # - nanosAsLong: lets the legacy TIMESTAMP(NANOS) generation load at
    #   all (Spark 4 rejects nanos otherwise); a no-op for µs files.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # legacy generation: TIMESTAMP(NANOS) surfaced as epoch-nanos long
        return normalize_legacy_ts(df)
    if isinstance(ts_type, T.TimestampNTZType):
        # current generation: naive timestamp[us]. Re-read with an explicit
        # TIMESTAMP (LTZ) schema instead of casting NTZ->LTZ post-scan:
        # the explicit read schema keeps ts filters pushable into the
        # parquet scan (a cast above the scan would fence pushdown).
        return spark.read.schema(_events_read_schema()).parquet(path)
    return df  # already TIMESTAMP


def event_ts(col: str = "ts"):
    """Canonical event-time column (TIMESTAMP) for frames produced by
    ``load`` — POST-normalization only. Do NOT point this at a raw
    legacy nanos-long column (a LONG cast to timestamp is read as epoch
    SECONDS, silently landing ~50,000 years out); raw legacy frames go
    through ``normalize_legacy_ts`` (or just use ``load``) first."""
    return F.col(col).cast("timestamp")


def event_ts_us(col: str = "ts"):
    """events.ts -> epoch-microseconds LONG, for operators that work on
    numeric time axes (sessionize / as-of / range-join / rollup)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def assert_contract(spark: SparkSession, sf_dir: str) -> None:
    """Fail loudly (with the observed diff) if any testdata table's
    post-load schema drifts from the expected contract — the §1.3
    schema-drift hazard, inverted for our own inputs. Cheap: reads
    parquet footers only, no data scan."""
    expected = {
        "region": {"r_regionkey": "int", "r_name": "string"},
        "nation": {"n_nationkey": "int", "n_name": "string",
                   "n_regionkey": "int"},
        "events": {n: t.simpleString() for n, t in EVENTS_FIELDS},
        "documents": {"doc_id": "bigint", "text": "string", "lang": "string",
                      "source": "string", "n_chars": "bigint"},
        "embeddings": {"vec_id": "bigint", "embedding": "array<float>",
                       "label": "int"},
    }
    problems = []
    for name, want in expected.items():
        got = {f.name: f.dataType.simpleString()
               for f in load(spark, sf_dir, name).schema.fields}
        if got != want:
            problems.append(f"{name}: expected {want}, observed {got}")
    # events is re-read under a FORCED schema (ts normalization), which
    # would mask any non-ts physical drift until mid-scan — so check the
    # raw footer too: every column must match the contract exactly except
    # ts, which may be any of the generations load() knows how to
    # normalize (nanos-long / µs-NTZ / µs-LTZ)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(
               os.path.join(sf_dir, "events.parquet")).schema.fields}
    for n, t in EVENTS_FIELDS:
        want_t = ({"bigint", "timestamp", "timestamp_ntz"} if n == "ts"
                  else {t.simpleString()})
        if raw.get(n) not in want_t:
            problems.append(
                f"events (physical): column {n} expected one of {want_t}, "
                f"observed {raw.get(n)!r}")
    extra = set(raw) - {n for n, _ in EVENTS_FIELDS}
    if extra:
        problems.append(f"events (physical): unexpected columns {sorted(extra)}")
    if problems:
        raise AssertionError(
            "testdata schema contract violated (regenerate-aware loader "
            "needs updating):\n  " + "\n  ".join(problems))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works too."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
