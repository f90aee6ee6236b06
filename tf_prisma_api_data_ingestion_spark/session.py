"""SparkSession factory.

Engine rule (SURVEY.md §2.5.1): no mutable global state — every run is a
pure function of (config, run_date). The session itself is the only shared
resource; everything else is passed explicitly.

Scale posture: these configs are what we'd ship to a 1000-executor cluster
(AQE on, skew-join handling, partition coalescing); only `master` and the
shuffle-partition count are local-test artifacts, overridable via env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tf-prisma-spark", cpus: int | str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster ``master`` comes from spark-submit; locally we honor
    $SPARK_GRAFT_CPUS (driver contract) and default to local[32].
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    # local mode runs driver+executors in ONE JVM whose default heap is
    # 1g — 32 task threads sharing 1g OOMs the shingle index at ~50k docs
    # (measured) and GC-throttles everything below that. A real executor
    # gets tens of GB; give the local JVM the equivalent. Must be set
    # before JVM launch; no-op via getOrCreate on an existing session.
    mem = os.environ.get("SPARK_GRAFT_MEM", "24g")
    builder = SparkSession.builder.config("spark.driver.memory", mem)
    # On a real cluster, master comes from spark-submit / SPARK_MASTER; only
    # force local mode when nothing else configured it.
    if not os.environ.get("SPARK_MASTER") and not os.environ.get("MASTER"):
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder
        .appName(app_name)
        # legacy fallback: older testdata generations wrote TIMESTAMP(NANOS),
        # which Spark 4 refuses unless surfaced as long; tables.load then
        # normalizes either generation to a canonical ts TIMESTAMP
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # deterministic timestamp semantics vs the DuckDB oracle
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime re-plan, partition coalescing, skew-join
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # AQE sizes every shuffle DOWN from this ceiling by observed
        # bytes (64 MB advisory target): corpus-scale shuffles (the
        # sf10 shingle-postings join spilled at the fixed 32-partition
        # default, measured 20.7x/decade) keep enough partitions to
        # stay in memory, while small shuffles coalesce back to ~cores.
        # This IS the "size shuffle.partitions to the data" knob, made
        # automatic — on a 1000-executor cluster the same ceiling
        # simply spreads wider.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "1024"))
        # without this, persisted frames freeze the UNcoalesced
        # initialPartitionNum-wide shuffle (cached plans are excluded
        # from AQE by default), so every consumer of a tracked_persist
        # barrier would scan 1024 near-empty partitions at small sf
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        # Shuffled-hash instead of sort-merge where a hash table fits
        # (guide §3.1): two independent, value-neutral gates measured
        # r14 (same-session interleaved A/B, min-of-3; tpch-q5
        # 1.82->1.46s, plan-provenance-report 3.92->2.99s,
        # dedup-embedding-lsh 2.30->1.90s — the sort on both shuffle
        # sides is pure overhead when partitions fit in memory).
        # - the AQE threshold converts SMJ->SHJ at runtime only when
        #   EVERY post-shuffle partition is under 64 MB of MEASURED
        #   bytes — scale-safe by construction (a 100 TB shuffle's
        #   partitions exceed it and keep sort-merge's spill path);
        # - the STATIC gate (preferSortMergeJoin=false) is OPT-IN as of
        #   r15 (set SPARK_GRAFT_PREFER_SMJ=false to enable): it picks
        #   SHJ from ESTIMATED sizes, so on a cluster a post-UDF or
        #   cached input with a bad estimate gets a hash build side
        #   that was never measured — an unbounded-memory risk the
        #   engine should not take by default (r14 verdict #1). The r15
        #   same-session A/B (scripts/r15_shj_ab.py) measured the
        #   static gate's local value at <= 0.2 s on the three keys the
        #   r14 config was tuned on (tpch-q5 1.90->1.68, embedding-lsh
        #   1.71->1.62, provenance-report neutral) — the AQE gate keeps
        #   most of the win with none of the estimate risk.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD",
                               "67108864"))
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"))
        # Arrow for any pandas-UDF path (the slow path, used sparingly)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep broadcast threshold default (10MB) — dims here are tiny;
        # explicit broadcast() hints are still used at join sites
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
