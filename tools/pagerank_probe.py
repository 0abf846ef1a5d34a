"""PageRank scale rehearsal: synthetic skewed graphs at growing edge counts
(default ladder 1M/2M/3M edges ≈ 60×/120×/180× sf0.1's trade graph), fixed
6 iterations — measures wall per scale so SCALE.md carries numbers, and
checks the structural invariants (hub nodes out-rank the long tail; total
fixed-point mass never exceeds n_nodes·scale).

Graph shape: 20% of edges land on 100 hub nodes (the web's power-law head),
the rest are hash-uniform — the skew the per-iteration groupBy(dst) must
absorb (AQE skew-join territory at cluster scale).

Usage: python tools/pagerank_probe.py [n_edges ...]   (default 1M 2M 3M)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators.graph import pagerank

    mega_hub = "--mega-hub" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(float(a)) for a in args] or [1_000_000, 2_000_000, 3_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n_edges in sizes:
        n_nodes = max(n_edges // 10, 1000)
        # honor the operator's overflow bound (n·scale·damping < 2^63) —
        # the --mega-hub rehearsal is exactly the worst-case concentration
        # the bound guards; pagerank raises a named error past it
        scale = min(10**12, (2**63 - 1) // (100 * n_nodes) // 2)
        ids = spark.range(n_edges)
        if mega_hub:
            # worst-case skew: HALF of all edges land on ONE node — the
            # hottest groupBy(dst) key a web graph can produce
            dst = (
                F.when(F.pmod("id", F.lit(2)) == 0, F.lit(0))
                .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)))
            )
        else:
            dst = (
                F.when(
                    F.pmod("id", F.lit(5)) == 0,
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)),
                )
                .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)))
            )
        edges = ids.select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
            dst.alias("dst"),
        ).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        ranks = pagerank(edges, n_iter=6, scale=scale)
        stats = ranks.agg(
            F.count("*").alias("nodes"),
            F.sum("rank_fp").alias("mass"),
        ).collect()[0]
        wall = time.perf_counter() - t0

        n_hubs = 1 if mega_hub else 100
        hub_min = (
            ranks.filter(F.col("node") < n_hubs).agg(F.min("rank_fp")).collect()[0][0]
        )
        tail_avg = (
            ranks.filter(F.col("node") >= n_hubs).agg(F.avg("rank_fp")).collect()[0][0]
        )
        assert stats["mass"] <= stats["nodes"] * scale, "mass exploded"
        assert hub_min > tail_avg, "hubs should out-rank the tail"
        print(
            json.dumps(
                {
                    "mode": "mega_hub" if mega_hub else "hubs100",
                    "n_edges": n_edges,
                    "n_nodes": stats["nodes"],
                    "iters": 6,
                    "wall_sec": round(wall, 2),
                    "sec_per_iter": round(wall / 6, 2),
                    "hub_min_over_tail_avg": round(hub_min / tail_avg, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
