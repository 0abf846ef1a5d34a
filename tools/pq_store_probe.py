"""PQ vector-store serving rehearsal (r12): the compressed twin of
tools/ivf_store_probe.py — at growing corpus sizes, measure what the
persisted codes buy at serve time.

Per scale:
- pq store build wall (one-time artifact: centroid freeze + codebook
  train + assign + encode + write) vs the plain store build;
- ADC serve wall from the store (ivf_pq_topk_from_index) vs the plain
  partition-pruned serve (ivf_topk_from_index) for a fixed 32-query
  batch, both against the SAME frozen quantizer;
- the BYTES story (the reason PQ exists at 100 TB): on-disk bytes of the
  probed cells' codes partitions vs the full vectors table — the ratio
  should track compression × n_probe/n_cells (VERDICT r11 #3's done
  criterion) — plus the probed vectors bytes (the exact-rerank tail's
  scan bound) and the shortlist row count (what the join keeps of it);
- exactness: served rows == in-session ivf_pq_topk rows over the same
  frozen quantizer + codebooks at every scale.

Usage: python tools/pq_store_probe.py [n_vectors ...] (default 50k 150k)
"""

from __future__ import annotations

import json
import os
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


def _dir_bytes(root: str, cell_ids=None) -> int:
    """On-disk bytes under a (batch_id, cell_id)-partitioned table,
    optionally restricted to the given cell ids — what a partition-pruned
    scan is allowed to touch."""
    total = 0
    want = None if cell_ids is None else {f"cell_id={c}" for c in cell_ids}
    for dirpath, _dirnames, filenames in os.walk(root):
        if want is not None:
            parts = dirpath.split(os.sep)
            if not any(p in want for p in parts):
                continue
        for f in filenames:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main(sizes: list[int]) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import similarity, vecstore
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("pq-store-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in sizes:
        emb = _embeddings(spark, n).localCheckpoint(eager=True)
        queries = emb.filter(F.col("vec_id") % (n // 32) == 1).limit(32)
        pq_store = tempfile.mkdtemp(prefix="pq_probe_")
        plain_store = tempfile.mkdtemp(prefix="pq_probe_plain_")
        try:
            t0 = time.perf_counter()
            vecstore.ivf_index_build(emb, pq_store, pq=True)
            build_pq = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            vecstore.ivf_index_build(emb, plain_store)
            build_plain = round(time.perf_counter() - t0, 2)

            meta = vecstore._store_meta(spark, pq_store)
            n_cells = meta["n_cells"]
            n_probe = max(2, n_cells // 16)  # the ivf_params target_frac

            t0 = time.perf_counter()
            served = vecstore.ivf_pq_topk_from_index(
                spark, pq_store, queries, k=10, n_probe=n_probe
            )
            served_rows = sorted(map(tuple, served.collect()))
            serve_pq = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            vecstore.ivf_topk_from_index(
                spark, plain_store, queries, k=10, n_probe=n_probe
            ).collect()
            serve_plain = round(time.perf_counter() - t0, 2)

            # exactness vs the in-session compressed path over the same
            # frozen quantizer + codebooks
            cents = vecstore.store_centroids(spark, pq_store)
            books = spark.read.parquet(f"{pq_store}/codebooks")
            cells = similarity.ivf_assign(emb, cents, n_probe=1).localCheckpoint(
                eager=True
            )
            codes = similarity.pq_encode(emb, books).localCheckpoint(eager=True)
            idx = {"books": books, "codes": codes, "cents": cents, "cells": cells}
            in_session = sorted(
                map(
                    tuple,
                    similarity.ivf_pq_topk(
                        emb, queries, k=10, n_probe=n_probe, index=idx
                    ).collect(),
                )
            )
            assert served_rows == in_session, "served != in-session"

            probed = [
                r.cell_id
                for r in similarity.ivf_assign(queries, cents, n_probe=n_probe)
                .select("cell_id")
                .distinct()
                .collect()
            ]
            vec_total = _dir_bytes(f"{pq_store}/vectors")
            vec_probed = _dir_bytes(f"{pq_store}/vectors", probed)
            codes_total = _dir_bytes(f"{pq_store}/codes")
            codes_probed = _dir_bytes(f"{pq_store}/codes", probed)

            # single-query serve: the pruning-bounded case (a uniform
            # 32-query batch deliberately probes most cells — worst case;
            # one query probes n_probe/n_cells of them)
            q1 = queries.limit(1).localCheckpoint(eager=True)
            probed1 = [
                r.cell_id
                for r in similarity.ivf_assign(q1, cents, n_probe=n_probe)
                .select("cell_id")
                .distinct()
                .collect()
            ]
            codes_probed1 = _dir_bytes(f"{pq_store}/codes", probed1)

            row = {
                "n_vectors": n,
                "n_cells": n_cells,
                "n_probe": n_probe,
                "build_pq_sec": build_pq,
                "build_plain_sec": build_plain,
                "serve_pq_sec": serve_pq,
                "serve_plain_sec": serve_plain,
                "vectors_bytes": vec_total,
                "codes_bytes": codes_total,
                "compression_on_disk": round(vec_total / max(1, codes_total), 2),
                "probed_cells_fraction": round(len(probed) / n_cells, 4),
                # the ADC scan's byte budget vs a full-vector rescan —
                # should track compression × prune
                "adc_scan_vs_full_vectors": round(
                    codes_probed / max(1, vec_total), 5
                ),
                "probed_cells_fraction_1q": round(len(probed1) / n_cells, 4),
                "adc_scan_vs_full_vectors_1q": round(
                    codes_probed1 / max(1, vec_total), 5
                ),
                "rerank_tail_vectors_bytes": vec_probed,
                "rerank_shortlist_rows": 50 * 32,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(pq_store, ignore_errors=True)
            shutil.rmtree(plain_store, ignore_errors=True)
    print(json.dumps({"rows": results}), flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 150_000]
    main(sizes)
