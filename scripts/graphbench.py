"""Graph-family scale bench: PageRank / triangles / BFS on DETERMINISTIC
synthetic graphs whose node AND edge counts grow 10x (the TPC-H-derived
co-purchase graph keeps a fixed key domain across sf, so it cannot
exercise graph growth). Edges are xxhash64-derived — no RNG, same graph
every run.

    python scripts/graphbench.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.operators.graph import (
        bfs_distances,
        pagerank_units,
        triangle_counts,
    )
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("graphbench")

    def edges(n_nodes: int, n_edges: int):
        return (spark.range(n_edges)
                .select((F.abs(F.xxhash64("id", F.lit(1))) % n_nodes)
                        .alias("doc_a"),
                        (F.abs(F.xxhash64("id", F.lit(2))) % n_nodes)
                        .alias("doc_b"))
                .filter(F.col("doc_a") != F.col("doc_b"))
                .localCheckpoint())

    print("| kernel | N=1e4,E=1e5 s | N=1e5,E=1e6 s | x |")
    print("|---|---|---|---|")
    for name, fn in (
        ("pagerank(3)", lambda e: pagerank_units(
            e.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")), iters=3)),
        ("triangles", triangle_counts),
        ("bfs(4)", lambda e: bfs_distances(e, 0, max_hops=4)),
    ):
        walls = []
        for n, m in ((10_000, 100_000), (100_000, 1_000_000)):
            e = edges(n, m)
            fn(e).count()  # warm (codegen)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                rows = fn(e).count()
                best = min(best, time.time() - t0)
            walls.append(best)
            print(f"# {name} N={n} rows={rows}", file=sys.stderr)
        print(f"| {name} | {walls[0]:.2f} | {walls[1]:.2f} "
              f"| {walls[1] / walls[0]:.1f}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
