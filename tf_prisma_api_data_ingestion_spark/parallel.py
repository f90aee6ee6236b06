"""Scan fan-out for CPU-heavy derivations.

Parquet splits by BYTES (spark.sql.files.maxPartitionBytes), which is the
right default when cost scales with I/O. Operators whose cost-per-row
dwarfs bytes-per-row (shingling, 64-permutation MinHash, per-token
hashing, vector math) break that assumption: a small single-row-group
file scans as ONE partition and the whole derivation serializes onto one
core (measured: the sf0.1 documents file is 0.6 MB -> 1 partition -> the
minhash signature pass ran 1-core-bound at 2.2 s while 15 cores idled).

``fan_out`` round-robin repartitions ONLY when the scan is narrower than
the session's parallelism — on a real cluster where the same table is
thousands of splits it's a no-op, so operators can call it
unconditionally. The shuffle it introduces moves just the projected
input columns (here: raw text, ~KB/row), which is orders of magnitude
cheaper than leaving cores idle through the expensive projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism if its
    current plan yields fewer partitions; no-op otherwise."""
    if df.isStreaming:
        return df  # micro-batch parallelism is the source's concern
    # If the lineage already contains a shuffle-inducing operator (join,
    # aggregate, repartition, window, sort, dedup, set-op), the data is
    # spread across shuffle partitions — and, under AQE, probing .rdd on
    # such a plan EXECUTES the shuffle stages just to learn a partition
    # count we'd throw away. Only narrow plans (scan/filter/project/
    # explode, the shape every operator entry actually receives) reach
    # the .rdd probe, where it is a plan-conversion no-op with no jobs.
    # Word-boundary match on node names: distinct()/dropDuplicates()
    # print as "Deduplicate", and a bare substring test would both miss
    # it and false-positive on e.g. a file path containing "Sort".
    import re
    analyzed = df._jdf.queryExecution().analyzed().toString()
    shuffly = re.compile(r"\b(Join|Aggregate|Repartition(?:ByExpression)?|"
                         r"Window|Sort|Deduplicate|Intersect|Except)\b")
    if shuffly.search(analyzed):
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
