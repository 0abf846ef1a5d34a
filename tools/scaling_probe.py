"""Scaling-evidence probe: times key operators across sf0.001 → sf0.1 (100×
data) and prints per-operator wall-time ratios. Linear-ish growth across 100×
at constant parallelism is the local evidence that the plan shapes (one
bounded shuffle, inverted-index joins, no pair explosions) hold as data
scales; quadratic growth would show up immediately as a >>100 ratio.

Also contrasts the as-of join against its naive join-explode-prune
formulation at sf0.1 — the designed plan must win, and the gap widens with
per-key history length.

Usage: python tools/scaling_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OPS = [
    "capture_pipeline",
    "q3_shipping_priority",
    "asof_latest_order",
    "minhash_pairs",
    "ngram_jaccard_pairs_capped",
    "near_dup_clusters",
    "time_bucketed_counts",
    "scrubbed_corpus",
    # r4 additions: the packing contract row and the fully-vectorized
    # SemDeDup (contract form: default 16 cells at every SF)
    "pack_sequences",
    "semantic_dedup",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pulsar_replay_spark.session import get_spark

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    qs["per_topic_count_ratio"](spark, SFS[0]).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in OPS:
        times = []
        for sf in SFS:
            t0 = time.perf_counter()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
        out[name] = {
            "sec_at_sf": dict(zip(["0.001", "0.01", "0.1"], times)),
            "ratio_100x_data": round(times[2] / max(times[0], 0.01), 1),
        }

    # New-tier ops across the same SFs (pytest-gated, not contract rows):
    # DSIR weight scoring, PCA moments, BPE training (10 merges — training
    # cost past the word-freq pass is vocab-sized, so its ratio isolates
    # the single corpus pass)
    from pulsar_replay_spark.operators import (
        bpe,
        curation,
        pca,
        quality,
        similarity,
        unigram,
    )

    def _mmr_pipeline(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") % 200 == 0)
        pool = similarity.ivf_topk(emb, queries, k=20)
        similarity.mmr_rerank(emb, pool, k=5).write.format("noop").mode(
            "overwrite"
        ).save()

    extra = {
        "dsir_log_weights": lambda spark, sf: curation.dsir_log_weights(
            spark.read.parquet(f"{sf}/documents.parquet"),
            spark.read.parquet(f"{sf}/documents.parquet").filter(F.col("lang") == "es"),
        ).write.format("noop").mode("overwrite").save(),
        "pca_moments": lambda spark, sf: pca.embedding_moments(
            spark.read.parquet(f"{sf}/embeddings.parquet")
        ),
        "bpe_train_10": lambda spark, sf: bpe.bpe_train(
            bpe.word_freqs(spark.read.parquet(f"{sf}/documents.parquet")), 10
        ),
        # serving pipeline: IVF candidate pool (k=20) + per-query Arrow MMR
        "mmr_rerank_pipeline": _mmr_pipeline,
        "vocab_stats_top100": lambda spark, sf: quality.vocab_stats(
            spark.read.parquet(f"{sf}/documents.parquet"), top_k=100
        ).write.format("noop").mode("overwrite").save(),
        # full pipeline: bigram-LM train + score + per-lang tier assignment
        "ccnet_buckets": lambda spark, sf: quality.ccnet_buckets(
            spark.read.parquet(f"{sf}/documents.parquet")
        ).write.format("noop").mode("overwrite").save(),
        # full pipeline: word_freqs + 1 EM round (cost past the corpus pass
        # is vocab-bound, like BPE)
        "unigram_train_v100": lambda spark, sf: unigram.unigram_train(
            bpe.word_freqs(spark.read.parquet(f"{sf}/documents.parquet")),
            100,
            n_iters=1,
        ),
    }
    for name, fn in extra.items():
        fn(spark, SFS[0])  # warm codegen/Arrow for THIS op before timing,
        # like the contract warm-up does for the OPS loop — otherwise the
        # sf0.001 cell absorbs the one-time cost and deflates the ratio
        times = []
        for sf in SFS:
            t0 = time.perf_counter()
            fn(spark, sf)
            times.append(round(time.perf_counter() - t0, 2))
        out[name] = {
            "sec_at_sf": dict(zip(["0.001", "0.01", "0.1"], times)),
            "ratio_100x_data": round(times[2] / max(times[0], 0.01), 1),
        }

    # as-of designed plan vs naive explode-prune at sf0.1
    from pulsar_replay_spark.operators.asof import asof_join, latest_per
    from pulsar_replay_spark.session import load_events

    sf = SFS[2]
    ev = load_events(spark, sf).select("event_id", "user_id", "ts")
    od = latest_per(
        spark.read.parquet(f"{sf}/orders.parquet").withColumnRenamed(
            "o_custkey", "user_id"
        ),
        ["user_id", "o_orderdate"],
        "o_orderkey",
    )
    t0 = time.perf_counter()
    asof_join(ev, od, "user_id", "ts", "o_orderdate", ["o_orderkey"]).write.format(
        "noop"
    ).mode("overwrite").save()
    designed = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    naive = (
        ev.join(od, (ev.user_id == od.user_id) & (od.o_orderdate <= ev.ts))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_id").orderBy(
                    F.desc("o_orderdate"), F.desc("o_orderkey")
                )
            ),
        )
        .filter("rn = 1")
    )
    naive.write.format("noop").mode("overwrite").save()
    naive_t = round(time.perf_counter() - t0, 2)
    out["asof_designed_vs_naive_sf0.1"] = {"designed_sec": designed, "naive_sec": naive_t}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
