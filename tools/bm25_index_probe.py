"""Postings-store scale rehearsal: the serve-forever argument, measured.

Builds the maintained BM25 postings store over the same Zipf-vocabulary
corpus as ``bm25_probe.py`` (hot head terms + long rare tail — the df
shape the sf fixtures can't express) and measures, at N× replicas:

- build wall (the one-time cost the store amortizes),
- rescan wall per query batch (the r8 query-bounded path) vs
  served-from-index wall (the r9 path) for a SECOND query batch — the
  repeated-serving scenario (continuous decontamination against a fixed
  eval suite) the store exists for,
- how many of the store's term_bucket partitions the serve actually
  reads (the partition-prune story: ≤ |query vocab| buckets, not the
  corpus),
- byte-equality of score_u between the two paths (the correctness pin,
  re-checked at scale).

Usage: python tools/bm25_index_probe.py [n_replicas]   (default 10)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_QUERIES = 32


def main(n_replicas: int = 10) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.functions.text import tokens
    from pulsar_replay_spark.operators import retrieval
    from pulsar_replay_spark.session import get_spark
    from tools.bm25_probe import DOCS_PER_REPLICA, _planted_corpus

    spark = get_spark("bm25-index-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = _planted_corpus(spark, n_replicas * DOCS_PER_REPLICA)
    n_docs = docs.count()

    queries = (
        docs.orderBy("doc_id")
        .limit(N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(tokens(F.col("text")), 1, 6), " ").alias("query"),
        )
        .localCheckpoint()
    )

    store = tempfile.mkdtemp(prefix="bm25_index_probe_")
    try:
        t0 = time.monotonic()
        retrieval.postings_index_build(docs, store)
        build_sec = time.monotonic() - t0

        t0 = time.monotonic()
        n_rescan = retrieval.bm25_topk(docs, queries, k=10).count()
        rescan_sec = time.monotonic() - t0

        t0 = time.monotonic()
        n_served = retrieval.bm25_topk_from_index(spark, store, queries, k=10).count()
        serve_sec = time.monotonic() - t0

        # partition-prune evidence: buckets the query vocabulary hashes into
        nb = retrieval._store_n_buckets(spark, store)
        vocab = retrieval.query_terms(queries).select("term").distinct()
        buckets_read = (
            vocab.select(retrieval.term_bucket(F.col("term"), nb).alias("b"))
            .distinct()
            .count()
        )

        # correctness pin at scale: byte-equal score_u between paths
        scan = retrieval.bm25_scores(docs, queries)
        served = retrieval.bm25_scores_from_index(spark, store, queries)
        mismatch = (
            scan.withColumnRenamed("score_u", "a")
            .join(served.withColumnRenamed("score_u", "b"),
                  ["query_id", "doc_id"], "full")
            .filter(
                F.col("a").isNull()
                | F.col("b").isNull()
                | (F.col("a") != F.col("b"))
            )
            .count()
        )

        print(
            json.dumps(
                {
                    "n_replicas": n_replicas,
                    "n_docs": n_docs,
                    "n_queries": N_QUERIES,
                    "index_build_sec": round(build_sec, 2),
                    "rescan_topk_sec": round(rescan_sec, 2),
                    "served_topk_sec": round(serve_sec, 2),
                    "serve_speedup": round(rescan_sec / max(serve_sec, 1e-9), 2),
                    "n_buckets": nb,
                    "buckets_probed": buckets_read,
                    "hits_equal": n_rescan == n_served,
                    "score_u_mismatches": mismatch,
                }
            )
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
