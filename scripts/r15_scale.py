"""r15 scale evidence (r14 VERDICT items 5 and 6).

Part A — op-triangle-count decades: the sf0.1 bench cannot witness
parallelism (8-core aggregate == 32-core), so the r14 persist collapse
(graph.py: und + oriented tracked_persist) is proven at graph decades:
deterministic xxhash-derived graphs with node AND edge counts x10 and
x100, persist ON (current code) vs OFF (tracked_persist patched to
identity — the pre-r14 recompute form), canary-bracketed min-of-3.
Sub-quadratic growth + persist never losing = the collapse holds at
scale.

Part B — SHJ config at 10x: the r15 default keeps only the AQE
measured-bytes SMJ->SHJ conversion and makes the static
preferSortMergeJoin=false gate opt-in. Interleaved A/B at a 10x corpus
(/tmp/sf1eq + rotated-copy 10x embeddings) on the three keys the r14
config was tuned on: default (AQE gate only) vs static gate on — both
arms in ONE session (the knob is a runtime SQL conf), min-of-3,
alternating order. "No spill regression" = the AQE-only default stays
within noise of the static gate at 10x.

Part C — streaming drain floor vs data size: stream-stream-join and
stream-funnel drains at floor (0-row events), sf0.001, sf0.1, and
sf1eq (events x10), plus sf1eq with 64 state partitions. The r14
decomposition said the per-drain wall is ~93% micro-batch machinery at
sf0.1; these rows confirm the floor stays fixed while the data cost
grows ~linearly.

    python scripts/r15_scale.py [partA|partB|partC ...]   # default: all
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"
SF1EQ = "/tmp/sf1eq"
FLOOR_DIR = "/tmp/r15_stream_floor"


def log(msg: str) -> None:
    print(f"OUT {msg}", flush=True)


def build_sf1eq() -> None:
    if not os.path.exists(f"{SF1EQ}/events.parquet"):
        from scale10 import build
        print("# building 10x dataset at /tmp/sf1eq ...", file=sys.stderr)
        build(SF1EQ)
    # 10x embeddings with per-copy vec_id shift and a per-copy ROTATION
    # of the embedding array: norms and within-copy geometry are
    # preserved exactly while cross-copy vectors decorrelate, so the
    # LSH bucket load grows ~10x without the quadratic same-vector
    # pair blowup verbatim copies would cause
    import duckdb
    marker = f"{SF1EQ}/.embeddings10"
    if not os.path.exists(marker):
        con = duckdb.connect()
        n = con.sql(f"SELECT max(vec_id) + 1 FROM "
                    f"read_parquet('{SF01}/embeddings.parquet')").fetchone()[0]
        con.sql(f"""
            COPY (
              SELECT e.vec_id + c.c * {n} AS vec_id,
                     list_concat(e.embedding[c.c + 1:],
                                 e.embedding[1:c.c]) AS embedding,
                     e.label
              FROM read_parquet('{SF01}/embeddings.parquet') e
              CROSS JOIN (SELECT unnest(range(10)) AS c) c
              ORDER BY vec_id
            ) TO '{SF1EQ}/embeddings.parquet' (FORMAT PARQUET)
        """)
        con.close()
        open(marker, "w").close()


def build_floor_dir() -> None:
    if os.path.exists(f"{FLOOR_DIR}/events.parquet"):
        return
    import duckdb
    os.makedirs(FLOOR_DIR, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF001}/{t}.parquet", f"{FLOOR_DIR}/{t}.parquet")
    duckdb.sql(f"""
        COPY (SELECT * FROM read_parquet('{SF001}/events.parquet')
              WHERE 1 = 0)
        TO '{FLOOR_DIR}/events.parquet' (FORMAT PARQUET)
    """)


def main() -> None:
    parts = set(a.lower() for a in sys.argv[1:]) or {"parta", "partb",
                                                     "partc"}

    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark import cache, tables
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    from tf_prisma_api_data_ingestion_spark.operators import graph
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r15_scale")

    def canary() -> float:
        df = (spark.range(0, 50_000_000, 1, 32)
              .selectExpr("sum(pmod(xxhash64(id), 1000000)) AS s"))
        for _ in range(4):
            materialize(df)
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            materialize(df)
            best = min(best, time.time() - t0)
        return round(best, 3)

    def min_of(build, n: int = 3) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            materialize(build())
            best = min(best, time.time() - t0)
            cache.release_all(blocking=True)
        return round(best, 3)

    log(f"canary start: {canary()}")

    # ---- Part A: triangle decades, persist ON vs OFF -----------------
    if "parta" in parts:
        def edges(n_nodes: int, n_edges: int):
            return (spark.range(n_edges)
                    .select((F.abs(F.xxhash64("id", F.lit(1))) % n_nodes)
                            .alias("doc_a"),
                            (F.abs(F.xxhash64("id", F.lit(2))) % n_nodes)
                            .alias("doc_b"))
                    .filter(F.col("doc_a") != F.col("doc_b"))
                    .localCheckpoint())

        real_persist = graph.tracked_persist
        for n, m in ((10_000, 100_000), (100_000, 1_000_000),
                     (1_000_000, 10_000_000)):
            e = edges(n, m)
            # warm codegen on the same data shape
            graph.triangle_counts(e).count()
            cache.release_all(blocking=True)
            w_on = min_of(lambda: graph.triangle_counts(e))
            graph.tracked_persist = lambda df: df  # pre-r14 recompute form
            try:
                w_off = min_of(lambda: graph.triangle_counts(e))
            finally:
                graph.tracked_persist = real_persist
            log(f"triangle N={n:>9,} E={m:>12,}: persist {w_on}s  "
                f"no-persist {w_off}s")

    # ---- Part B: SHJ config A/B at 10x --------------------------------
    if "partb" in parts:
        build_sf1eq()
        tables.assert_contract(spark, SF01)
        for t in tables.TABLE_NAMES:
            tables.load(spark, SF1EQ, t).count()
        keys = ("tpch-q5", "dedup-embedding-lsh", "plan-provenance-report")
        arms = (("default(AQE-gate)", "true"), ("static-SHJ", "false"))
        for key in keys:
            fn = QUERIES[key]
            fn(spark, SF001).count()  # warm codegen
            cache.release_all(blocking=True)
            walls = {}
            # alternating arms, min-of-3 each, one session
            for rep in range(3):
                for label, pref in (arms if rep % 2 == 0
                                    else tuple(reversed(arms))):
                    spark.conf.set("spark.sql.join.preferSortMergeJoin",
                                   pref)
                    t0 = time.time()
                    materialize(fn(spark, SF1EQ))
                    walls[label] = min(walls.get(label, float("inf")),
                                       time.time() - t0)
                    cache.release_all(blocking=True)
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
            log(f"shj-ab {key} @10x: " + "  ".join(
                f"{lbl} {w:.2f}s" for lbl, w in walls.items()))

    # ---- Part C: streaming drain floor vs data size -------------------
    if "partc" in parts:
        build_sf1eq()
        build_floor_dir()
        scales = (("floor(0 rows)", FLOOR_DIR), ("sf0.001", SF001),
                  ("sf0.1", SF01), ("sf1eq(10x)", SF1EQ))
        for key in ("stream-stream-join", "stream-funnel"):
            fn = QUERIES[key]
            fn(spark, SF001).count()  # warm the micro-batch machinery
            cache.release_all(blocking=True)
            row = []
            for label, d in scales:
                row.append(f"{label} {min_of(lambda: fn(spark, d))}s")
            # sf1eq again with 64 state partitions (new streaming query
            # picks up the current shuffle-partition setting)
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "64")
            try:
                row.append(f"sf1eq@64part {min_of(lambda: fn(spark, SF1EQ))}s")
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            log(f"stream {key}: " + "  ".join(row))

    log(f"canary end: {canary()}")
    spark.stop()


if __name__ == "__main__":
    main()
