"""IVF vector-store serving rehearsal (r11): build-once, serve-many at
growing corpus sizes — the dense twin of tools/bm25_index_probe.py.

Measures per scale:
- store build wall (one-time artifact: centroid freeze + assign + write);
- serve-from-store wall for a fixed 32-query batch (partition-pruned:
  only the queries' probed cells are read);
- the same queries through the in-session ivf_topk rescan posture
  (re-derives corpus assignment per call) — the cost the store removes;
- the measured scanned fraction (vectors in probed cells / corpus) vs
  the nominal n_probe/n_cells bound;
- exactness: served rows == in-session rows over the same centroids at
  every scale (the byte-equality gate, re-asserted outside pytest).

Usage: python tools/ivf_store_probe.py [n_vectors ...] (default 50k 150k)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIM = 64


def _embeddings(spark, n: int):
    from pyspark.sql import functions as F

    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.concat(F.col("id"), F.lit("_"), d)), F.lit(1000))
            / 1000.0
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def main(sizes: list[int]) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import similarity, vecstore
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("ivf-store-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in sizes:
        emb = _embeddings(spark, n).localCheckpoint(eager=True)
        queries = emb.filter(F.col("vec_id") % (n // 32) == 1).limit(32)
        store = tempfile.mkdtemp(prefix="ivf_probe_")
        try:
            t0 = time.perf_counter()
            vecstore.ivf_index_build(emb, store)
            build = round(time.perf_counter() - t0, 2)

            n_cells = vecstore._store_meta(spark, store)["n_cells"]
            n_probe = max(2, n_cells // 16)  # the ivf_params target_frac

            t0 = time.perf_counter()
            served = vecstore.ivf_topk_from_index(
                spark, store, queries, k=10, n_probe=n_probe
            )
            served_rows = sorted(map(tuple, served.collect()))
            serve = round(time.perf_counter() - t0, 2)

            cents = vecstore.store_centroids(spark, store)
            t0 = time.perf_counter()
            rescan = similarity.ivf_topk(
                emb, queries, k=10, n_probe=n_probe, centroids=cents
            )
            rescan_rows = sorted(map(tuple, rescan.collect()))
            rescan_wall = round(time.perf_counter() - t0, 2)
            assert served_rows == rescan_rows, "served != rescan"

            # the cost the store amortizes: the rescan posture re-derives
            # the FULL corpus assignment (O(N·cells·dim)) on every serve
            t0 = time.perf_counter()
            similarity.ivf_assign(emb, cents, n_probe=1).count()
            assign_wall = round(time.perf_counter() - t0, 2)

            probed = [
                r.cell_id
                for r in similarity.ivf_assign(queries, cents, n_probe=n_probe)
                .select("cell_id")
                .distinct()
                .collect()
            ]
            scanned = (
                spark.read.parquet(f"{store}/vectors")
                .filter(F.col("cell_id").isin(probed))
                .count()
            )

            # single-query serve: the pruning-bounded case (one query
            # probes n_probe/n_cells of the cells — a 32-query uniform
            # batch probes most of them, by design of this worst case)
            q1 = queries.limit(1).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            vecstore.ivf_topk_from_index(
                spark, store, q1, k=10, n_probe=n_probe
            ).collect()
            serve_1q = round(time.perf_counter() - t0, 2)
            probed1 = [
                r.cell_id
                for r in similarity.ivf_assign(q1, cents, n_probe=n_probe)
                .select("cell_id")
                .distinct()
                .collect()
            ]
            scanned1 = (
                spark.read.parquet(f"{store}/vectors")
                .filter(F.col("cell_id").isin(probed1))
                .count()
            )

            row = {
                "n_vectors": n,
                "n_cells": n_cells,
                "n_probe": n_probe,
                "build_sec": build,
                "serve_from_store_sec": serve,
                "in_session_rescan_sec": rescan_wall,
                "corpus_assign_only_sec": assign_wall,
                "scanned_fraction_32q": round(scanned / n, 4),
                "serve_1q_sec": serve_1q,
                "scanned_fraction_1q": round(scanned1 / n, 4),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(store, ignore_errors=True)
    print(json.dumps({"probe": "ivf_store", "results": results}))


if __name__ == "__main__":
    sizes = [int(float(a)) for a in sys.argv[1:]] or [50_000, 150_000]
    main(sizes)
