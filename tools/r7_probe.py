"""Round-7 10× rehearsal probe: measures the round's new operators at the
stress volume (20k vectors, 50k documents — ``tools/stress_big.build``'s
replicated fixtures) so their SCALE.md rows carry measured numbers, not
prose:

- corpus-scaled lsh_topk: measured candidate fraction + wall vs the fixed
  contract geometry;
- perceptual frame dedup end-to-end on ~40k frames (fake decode path);
- incremental cluster-label maintenance vs from-scratch CC per batch;
- WARC front door over a generated multi-segment .warc.gz corpus.

Usage: python tools/r7_probe.py [n_replicas]   (reuses /tmp/sfbig when
present AND no n_replicas given; passing n forces a rebuild at that scale)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.stress_big import DST, build  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import dedup, multimodal, similarity
    from pulsar_replay_spark.session import get_spark
    from pulsar_replay_spark.sources import corpusio

    spark = get_spark("r7-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else None
    if n_replicas is not None or not os.path.exists(f"{DST}/embeddings.parquet"):
        t0 = time.perf_counter()
        build(spark, n_replicas or 10)
        out["build_s"] = round(time.perf_counter() - t0, 1)
        out["n_replicas"] = n_replicas or 10

    def read(t):
        return spark.read.parquet(f"{DST}/{t}.parquet")

    def timeit(name, thunk):
        t0 = time.perf_counter()
        r = thunk()
        out[name] = round(time.perf_counter() - t0, 2)
        return r

    # --- corpus-scaled LSH vs the fixed contract geometry (20k vectors) ---
    emb = read("embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    length, b = similarity.lsh_params(n)
    out["lsh_params_20k"] = [length, b]
    out["lsh_frac_scaled_20k"] = round(
        similarity.lsh_candidate_fraction(emb, queries, length, b), 4
    )
    out["lsh_frac_fixed_20k"] = round(
        similarity.lsh_candidate_fraction(
            emb, queries, similarity.N_TABLES, similarity.BITS_PER_TABLE
        ),
        4,
    )
    timeit(
        "lsh_topk_scaled_20k",
        lambda: similarity.lsh_topk(
            emb, queries, k=5, n_tables=length, bits_per_table=b
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    timeit(
        "lsh_topk_fixed_20k",
        lambda: similarity.lsh_topk(emb, queries, k=5)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # --- perceptual frame dedup over ~40k frames (fake decode) ---
    docs = read("documents")
    media = multimodal.as_media(docs).filter(F.col("media_type") == "video/mp4")
    frames = multimodal.frame_sample(media, n_frames=4, frame_len=64).localCheckpoint(
        eager=True
    )
    out["n_frames"] = frames.count()
    marks = timeit(
        "frame_dedup_perceptual_40k",
        lambda: multimodal.frame_dedup_perceptual(frames, max_hamming=4)
        .localCheckpoint(eager=True),
    )
    out["frames_kept"] = marks.filter("keep").count()

    # --- incremental labels vs from-scratch CC (50k docs, 3 batches) ---
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    labels = spark.createDataFrame([], "doc_id long, cluster_id long")
    idx = spark.createDataFrame([], "doc_id long, band int, band_key string")
    t_inc = []
    for bdf in batches:
        t0 = time.perf_counter()
        pairs, nb = dedup.incremental_minhash_pairs(bdf, idx)
        labels = dedup.merge_cluster_labels(labels, pairs).localCheckpoint(eager=True)
        idx = idx.unionAll(nb).localCheckpoint(eager=True)
        t_inc.append(round(time.perf_counter() - t0, 2))
    out["labels_incremental_per_batch_50k"] = t_inc
    out["labels_rows"] = labels.count()
    timeit(
        "labels_full_cc_50k",
        lambda: dedup.connected_components(dedup.minhash_candidate_pairs(docs))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # --- WARC front door: 8 gz segments × 6250 records = 50k docs ---
    import gzip

    warc_dir = f"/tmp/r7_warc_{n_replicas or 10}"
    if not os.path.exists(warc_dir):
        os.makedirs(warc_dir)
        rows = docs.select("doc_id", "text").limit(50_000).collect()
        per_seg = (len(rows) + 7) // 8
        for s in range(8):
            buf = []
            for r in rows[s * per_seg : (s + 1) * per_seg]:
                body = (r["text"] or "").encode()
                hdr = (
                    f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                    f"WARC-Target-URI: https://x.example/{r['doc_id']}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode()
                buf.append(gzip.compress(hdr + body + b"\r\n\r\n"))
            with open(f"{warc_dir}/seg{s}.warc.gz", "wb") as fh:
                fh.write(b"".join(buf))
    got = timeit(
        "warc_ingest_50k",
        lambda: corpusio.read_warc_corpus(spark, warc_dir).localCheckpoint(
            eager=True
        ),
    )
    out["warc_rows"] = got.count()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
