"""10× scale rehearsal: replicate the sf0.1 fixtures with shifted keys into
/tmp (≈ TPC-H SF1-equivalent lineitem volume, 1M events, 50k documents where
every source doc gains 9 clones — a dedup stress by construction), then run
the headline operators and print one JSON line of timings + result sanity.

Replication preserves referential integrity: every fact key is shifted by
replica_index × (max_key + 1) consistently across tables.

Usage: python tools/stress_big.py [n_replicas]   # default 10
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfbig"


def build(spark, n: int) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.session import load_events

    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)

    def read(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    # key strides
    O = read("orders").agg(F.max("o_orderkey")).first()[0] + 1
    C = read("customer").agg(F.max("c_custkey")).first()[0] + 1
    P = read("part").agg(F.max("p_partkey")).first()[0] + 1
    E = 10_000_000
    U = read("events") and None  # events loaded via load_events below
    reps = spark.range(n).withColumnRenamed("id", "rep")

    def replicate(df, shifts: dict):
        out = df.crossJoin(reps)
        for col, stride in shifts.items():
            out = out.withColumn(col, F.col(col) + F.col("rep") * stride)
        return out.drop("rep")

    replicate(read("customer"), {"c_custkey": C}).write.parquet(f"{DST}/customer.parquet")
    replicate(read("orders"), {"o_orderkey": O, "o_custkey": C}).write.parquet(
        f"{DST}/orders.parquet"
    )
    replicate(read("lineitem"), {"l_orderkey": O, "l_partkey": P}).write.parquet(
        f"{DST}/lineitem.parquet"
    )
    replicate(read("part"), {"p_partkey": P}).write.parquet(f"{DST}/part.parquet")
    for t in ("region", "nation", "supplier"):
        read(t).write.parquet(f"{DST}/{t}.parquet")

    ev = load_events(spark, SRC)
    emax = ev.agg(F.max("user_id")).first()[0] + 1
    ev_rep = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * E)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * emax)
        .drop("rep")
    )
    # write ts as micros long is fine — stress queries use this dir's events
    # via plain read (TimestampType survives parquet round-trip)
    ev_rep.write.parquet(f"{DST}/events_plain.parquet")

    D = read("documents").agg(F.max("doc_id")).first()[0] + 1
    replicate(read("documents"), {"doc_id": D}).write.parquet(f"{DST}/documents.parquet")
    V = read("embeddings").agg(F.max("vec_id")).first()[0] + 1
    # Embedding replicas are circularly dim-shifted by replica index — a
    # norm-preserving rotation that makes replicas DISTINCT vectors occupying
    # new regions of space. Exact clones would all share a nearest centroid
    # forever (identical vectors can never split across cells), so clone
    # replication measures duplication density, not corpus growth — and
    # SemDeDup is intrinsically quadratic in duplication (the pipeline runs
    # exact dedup first for exactly that reason).
    dim = len(read("embeddings").first()["embedding"])
    shifted = F.expr(
        f"concat(slice(embedding, (rep % {dim}) + 1, {dim} - (rep % {dim})), "
        f"slice(embedding, 1, rep % {dim}))"
    )
    (
        read("embeddings")
        .crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * V)
        .withColumn("embedding", shifted)
        .drop("rep")
        .write.parquet(f"{DST}/embeddings.parquet")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import dedup, similarity
    from pulsar_replay_spark.operators.asof import asof_join, latest_per
    from pulsar_replay_spark.operators.capture import capture_pipeline
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("stress-big")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    build(spark, n)
    build_s = round(time.perf_counter() - t0, 1)

    def read(t):
        return spark.read.parquet(f"{DST}/{t}.parquet")

    sizes = {t: read(t).count() for t in ("lineitem", "orders", "events_plain", "documents", "embeddings")}

    out: dict[str, float] = {}

    def timeit(name, df):
        t = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t, 2)

    li, orders, cust, nation, region, supp = (
        read("lineitem"), read("orders"), read("customer"),
        read("nation"), read("region"), read("supplier"),
    )
    timeit(
        "q1_agg_6m",
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*")
        ),
    )
    timeit(
        "q3_join_6m",
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(li.l_extendedprice * (1 - li.l_discount)).alias("rev")),
    )
    ev = read("events_plain")
    timeit("capture_1m", capture_pipeline(ev))
    od = latest_per(orders.withColumnRenamed("o_custkey", "user_id"),
                    ["user_id", "o_orderdate"], "o_orderkey")
    timeit("asof_1m_events", asof_join(ev.select("event_id", "user_id", "ts"), od,
                                       "user_id", "ts", "o_orderdate", ["o_orderkey"]))
    docs = read("documents")
    t = time.perf_counter()
    n_pairs = dedup.minhash_candidate_pairs(docs).count()
    out["minhash_pairs_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    n_clusters = dedup.near_dup_clusters(docs).count()
    out["near_dup_clusters_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    scrub = dedup.scrub_repeated_chunks(docs)
    n_scrubbed = scrub.filter(F.col("n_kept_chunks") < F.col("n_chunks")).count()
    out["chunk_scrub_50k_docs"] = round(time.perf_counter() - t, 2)
    # the two worst 100×-ratio scalers from SCALE.md, probed at rehearsal
    # volume. n-gram Jaccard runs twice: production cap (clones push every
    # shingle past df=20, so the pair stage is starved — the cap doing its
    # job) and cap scaled ×replicas (per-clone-group fan-out comparable to
    # the sf0.1 baseline, so the pair stage does real work).
    t = time.perf_counter()
    n_ngram = dedup.ngram_jaccard_pairs(docs, 0.5, max_shingle_df=20).count()
    out["ngram_jaccard_cap20_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    n_ngram_scaled = dedup.ngram_jaccard_pairs(
        docs, 0.5, max_shingle_df=20 * n
    ).count()
    out["ngram_jaccard_cap_scaled_50k_docs"] = round(time.perf_counter() - t, 2)
    # SemDeDup with cells ∝ N (semdedup_cells): per-cell pair work constant
    # per vector — the √N ivf_params rule measured 22× at 10× volume (N^1.5)
    emb = read("embeddings")
    n_vecs = emb.count()
    t = time.perf_counter()
    sd = similarity.semantic_dedup(
        emb, threshold=0.6, n_cells=similarity.semdedup_cells(n_vecs)
    )
    n_semdrop = sd.filter(~F.col("keep")).count()
    out["semantic_dedup_20k_vecs"] = round(time.perf_counter() - t, 2)
    queries = emb.filter(F.col("vec_id") % 1000 == 0)
    t = time.perf_counter()
    similarity.lsh_topk(emb, queries, k=5).write.format("noop").mode("overwrite").save()
    out["lsh_topk_20k_vecs"] = round(time.perf_counter() - t, 2)

    # new tier at rehearsal volume: DSIR weights over 50k docs (the clone
    # structure makes raw≈target-heavy — fine, the timing is the point),
    # BPE training (corpus pass + vocab-frame rounds), PCA moments
    from pulsar_replay_spark.operators import bpe, curation, pca

    t = time.perf_counter()
    curation.dsir_log_weights(docs, docs.filter(F.col("lang") == "es")).write.format(
        "noop"
    ).mode("overwrite").save()
    out["dsir_weights_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    n_merges = len(bpe.bpe_train(bpe.word_freqs(docs), 10))
    out["bpe_train10_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    pca.embedding_moments(emb)
    out["pca_moments_20k_vecs"] = round(time.perf_counter() - t, 2)

    # retrieval post-processing + corpus management at rehearsal volume
    from pulsar_replay_spark.operators import quality, skew

    t = time.perf_counter()
    pool = similarity.ivf_topk(emb, queries, k=20)
    similarity.mmr_rerank(emb, pool, k=5).write.format("noop").mode(
        "overwrite"
    ).save()
    out["mmr_rerank_20k_vecs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    quality.ccnet_buckets(docs).write.format("noop").mode("overwrite").save()
    out["ccnet_buckets_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    diff = curation.dataset_diff(docs, docs.filter(F.col("doc_id") % 7 != 0))
    n_churn = curation.dataset_diff_summary(diff).count()
    out["dataset_diff_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    est = skew.join_size_estimate(li, orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
    out["join_advisor_6m_rows"] = round(time.perf_counter() - t, 2)

    from pulsar_replay_spark.operators import bpe as _bpe
    from pulsar_replay_spark.operators import packing, unigram

    t = time.perf_counter()
    um = unigram.unigram_train(_bpe.word_freqs(docs), vocab_size=200, n_iters=1)
    out["unigram_train_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    unigram.unigram_token_counts(docs, um).write.format("noop").mode("overwrite").save()
    out["unigram_counts_50k_docs"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    packing.length_bucketed_batches(docs).write.format("noop").mode("overwrite").save()
    out["length_batches_50k_docs"] = round(time.perf_counter() - t, 2)

    # r6 trainers/miners at rehearsal volume: the distributed WordPiece
    # trainer (vocab-keyed rounds — wall should track vocab, not corpus)
    # and the bitext candidates path (IVF sweeps + exact re-scoring on the
    # candidate subset — the corpus×corpus shape that must never cross-join)
    from pulsar_replay_spark.operators import wordpiece

    t = time.perf_counter()
    n_wp = len(wordpiece.wordpiece_train(_bpe.word_freqs(docs), 10))
    out["wordpiece_train10_50k_docs"] = round(time.perf_counter() - t, 2)
    emb_a = emb.filter(F.col("vec_id") % 2 == 0)
    emb_b = emb.filter(F.col("vec_id") % 2 == 1)
    t = time.perf_counter()
    bt_cands = similarity.bitext_candidates_ivf(emb_a, emb_b, k=4)
    bt = similarity.bitext_mine(
        emb_a, emb_b, k=4, margin_threshold=1.0, candidates=bt_cands
    )
    n_bitext = bt.count()
    out["bitext_ivf_20k_vecs"] = round(time.perf_counter() - t, 2)

    # composed streaming ingest at rehearsal volume: the replicated corpus
    # arrives as 4 micro-batches; every batch pays exact-hash + LSH-index
    # probes against everything admitted before it (clone replicas = planted
    # cross-batch dups, so the dedup path does real work)
    from pulsar_replay_spark.functions.text import token_count
    from pulsar_replay_spark.streaming import pipelines as sp

    ingest_src = f"{DST}/ingest_src"
    docs.repartition(4).write.mode("overwrite").parquet(ingest_src)
    acc_dir, idx_dir, ck_dir = f"{DST}/ing_acc", f"{DST}/ing_idx", f"{DST}/ing_ck"
    t = time.perf_counter()
    sp.curation_ingest_sink(
        sp.documents_stream(spark, ingest_src),
        acc_dir,
        idx_dir,
        ck_dir,
        lambda df: df.select(
            "doc_id", token_count(F.col("text")).cast("double").alias("score")
        ),
        threshold=5.0,
    ).awaitTermination()
    out["curation_ingest_4_batches"] = round(time.perf_counter() - t, 2)
    n_accepted = spark.read.parquet(acc_dir).count()

    print(json.dumps({
        "replicas": n, "build_sec": build_s, "rows": sizes,
        "timings_sec": out,
        "sanity": {
            "minhash_pairs": n_pairs,
            "ngram_jaccard_cap20_pairs": n_ngram,
            "ngram_jaccard_cap_scaled_pairs": n_ngram_scaled,
            "semantic_dedup_dropped": n_semdrop,
            "near_dup_clusters": n_clusters,
            "docs_with_scrubbed_chunks": n_scrubbed,
            "diff_statuses": n_churn,
            "join_advisor": est,
            "ingest_accepted_docs": n_accepted,
            "wordpiece_merges": n_wp,
            "bitext_pairs": n_bitext,
        },
    }))


if __name__ == "__main__":
    main()
