"""sf0.1→sf1 PageRank growth decomposition (r11, verdict #6).

`pagerank_trade_adaptive` was the one headline row whose sf1 wall grew
fastest (r10: 4.57 s → 29.8 s at 10× data). This probe separates that
growth into its parts at BOTH scales so SCALE.md can name what dominates:

- edge build: the orders⋈lineitem distinct + bidirectional union that
  materializes the trade graph (one-time, localCheckpointed);
- node/adaptive setup: the node frame + the adaptive-scale count;
- per-round marginal: ((wall at 6 iters) − (wall at 1 iter)) / 5 — the
  edge-scale join + node-scale groupBy each synchronous round pays;
- fixed overhead: wall at 1 iter minus one marginal round.

sf1 is synthesized from sf0.1 the rehearsal way (10 key-offset replicas —
each replica's orders join only its own lineitems, so the edge
relation grows linearly and the degree distribution is preserved).

Usage: python tools/pagerank_decomp_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
OFF = 100_000_000
N_REPLICAS = 10
_ITER, _DAMP, _CAP = 6, 85, 10**12


def _edges(spark, orders, li):
    from pyspark.sql import functions as F

    fwd = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _tables(spark, replicas: int):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SRC}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    if replicas == 1:
        return orders, li
    reps = spark.range(replicas).select((F.col("id") * OFF).alias("off"))
    orders = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("off")).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("off")).alias("o_custkey"),
    )
    li = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("off")).alias("l_orderkey"),
        (F.col("l_suppkey") + F.col("off")).alias("l_suppkey"),
    )
    return orders, li


def main() -> None:
    from pulsar_replay_spark.operators.graph import pagerank_adaptive
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("pagerank-decomp", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for tag, replicas in (("sf0.1", 1), ("sf1", N_REPLICAS)):
        orders, li = _tables(spark, replicas)

        t0 = time.perf_counter()
        edges = _edges(spark, orders, li).localCheckpoint(eager=True)
        n_edges = edges.count()
        edge_build = round(time.perf_counter() - t0, 2)

        def run(n_iter: int) -> float:
            t0 = time.perf_counter()
            pagerank_adaptive(
                edges, n_iter=n_iter, damping_pct=_DAMP, cap=_CAP
            ).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        w1 = run(1)
        w6 = run(_ITER)
        per_round = (w6 - w1) / (_ITER - 1)
        row = {
            "scale": tag,
            "n_edges": int(n_edges),
            "edge_build_sec": edge_build,
            "wall_1_iter_sec": round(w1, 2),
            "wall_6_iter_sec": round(w6, 2),
            "per_round_marginal_sec": round(per_round, 2),
            "fixed_setup_sec": round(w1 - per_round, 2),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    r = {
        "probe": "pagerank_decomp",
        "edge_growth": round(out[1]["n_edges"] / out[0]["n_edges"], 2),
        "wall_growth_6_iter": round(
            out[1]["wall_6_iter_sec"] / max(out[0]["wall_6_iter_sec"], 1e-9), 2
        ),
        "per_round_growth": round(
            out[1]["per_round_marginal_sec"]
            / max(out[0]["per_round_marginal_sec"], 1e-9),
            2,
        ),
        "results": out,
    }
    print(json.dumps(r))


if __name__ == "__main__":
    main()
