"""BM25 scale rehearsal: plant a Zipf-vocabulary corpus at N× volumes (the
sf fixtures' vocabulary is too small — every term lands in >30% of docs, so
neither the query-bounding nor the df-cap has anything realistic to do) and
measure the query-bounded retrieval path — wall time, how many postings the
broadcast query-vocabulary filter lets past the scan (the whole scale
argument: the corpus is never indexed for terms the queries don't mention),
and what the df-cap skew lever removes on top.

Usage: python tools/bm25_probe.py [n_replicas]   (default 10; 20/30 for the
rehearsal ladder; 5k docs × 100 Zipf tokens per replica)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_QUERIES = 32
DOCS_PER_REPLICA = 5_000
DOC_LEN = 100
VOCAB = 20_000


def _planted_corpus(spark, n_docs: int):
    """Deterministic Zipf corpus: term ids drawn ∝ 1/(rank+10) from a 20k
    vocabulary — hot head terms (the stopword analog) plus a long rare
    tail, the df shape web text actually has."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(8)
    probs = 1.0 / (np.arange(VOCAB) + 10.0)
    probs /= probs.sum()
    ids = rng.choice(VOCAB, size=(n_docs, DOC_LEN), p=probs)
    texts = [" ".join(f"w{t}" for t in row) for row in ids]
    pdf = pd.DataFrame({"doc_id": np.arange(n_docs, dtype="int64"), "text": texts})
    return spark.createDataFrame(pdf).repartition(32).localCheckpoint()


def main(n_replicas: int = 10) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.functions.text import tokens
    from pulsar_replay_spark.operators import retrieval
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("bm25-probe", cpus=32)
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

    total_tokens = docs.select(
        F.sum(F.size(F.filter(tokens(F.col("text")), lambda t: t != "")))
    ).first()[0]
    postings = retrieval.query_postings(docs, queries).localCheckpoint()
    n_postings = postings.count()
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    capped_terms = df_t.filter(F.col("df") > n_docs * 0.3).count()
    capped_postings = (
        postings.join(df_t.filter(F.col("df") > n_docs * 0.3), "term").count()
    )

    t0 = time.monotonic()
    n_hits = retrieval.bm25_topk(docs, queries, k=10).count()
    wall = time.monotonic() - t0

    t0 = time.monotonic()
    n_hits_capped = retrieval.bm25_topk(
        docs, queries, k=10, max_df_ratio=0.3
    ).count()
    wall_capped = time.monotonic() - t0

    print(
        json.dumps(
            {
                "n_replicas": n_replicas,
                "n_docs": n_docs,
                "n_queries": N_QUERIES,
                "total_tokens": int(total_tokens),
                "query_bounded_postings": n_postings,
                "postings_frac_of_tokens": round(n_postings / total_tokens, 4),
                "df_capped_terms_0.3": capped_terms,
                "df_capped_postings_0.3": capped_postings,
                "bm25_topk_sec": round(wall, 2),
                "bm25_topk_capped_sec": round(wall_capped, 2),
                "n_hits": n_hits,
                "n_hits_capped": n_hits_capped,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
