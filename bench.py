"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (full computation of every
column, nothing collected to the driver, no disk write) — the honest
throughput measurement for a distributed plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "capture_pipeline",
    "per_topic_limit",
    "time_bucketed_counts",
    "sessionize",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_item_customers",
    "window_analytics",
    "asof_latest_order",
    "doc_profile",
    "minhash_pairs",
    # df-capped index is the serving path (exact stays as the oracle twin)
    "ngram_jaccard_pairs_capped",
    # ANN is the serving path for similarity (brute-force embedding_topk is
    # the recall oracle, not the headline); LSH candidate generation is pure
    # equi-joins — no nested-loop operator anywhere in the benched plan
    "ann_lsh_topk",
    # dedup end-products: the steepest-scaling family, benched so regressions
    # are visible round over round
    "near_dup_clusters",
    "dedup_corpus_stats",
    "scrubbed_corpus",
    "generator",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import __spark_entry__ as entrymod
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Warm the JVM/codegen once on a cheap query so timings measure the
    # queries, not session startup.
    qs["per_topic_count_ratio"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    # IVF-PQ serving pair: index build is a one-time artifact (reported
    # separately, not part of the headline total); the benched headline is
    # the query-time path against the prebuilt compressed index.
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.perf_counter()
    pq_idx = similarity.pq_index(emb)
    index_build = {"ann_ivf_pq_index": round(time.perf_counter() - t0, 3)}
    pq_queries = emb.filter(F.col("vec_id") % 200 == 0)
    t0 = time.perf_counter()
    similarity.ivf_pq_topk(emb, pq_queries, k=5, index=pq_idx).write.format(
        "noop"
    ).mode("overwrite").save()
    times["ann_ivf_pq_topk"] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)

    # Derived throughputs comparable to BASELINE.md's reference numbers:
    # the reference publishes 1 000 msgs at a 1 000 msg/s target (2 000 in its
    # documented example) and captures topics single-threaded; `generator`
    # produces the same 1 000 emailSend docs, `capture_pipeline` scans the
    # full events table.
    events_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # Generation throughput is measured on the generation+serialization
    # pipeline itself (the reference's workload: produce emailSend JSON
    # messages), not on the contract `generator` query, whose from_json
    # parse-back legs exist for oracle parity, not production.
    from pulsar_replay_spark.generator import generate_emailsend

    gen_n = 100_000
    t0 = time.perf_counter()
    generate_emailsend(spark, gen_n).select("id", "json").write.format(
        "noop"
    ).mode("overwrite").save()
    gen_sec = time.perf_counter() - t0
    throughput = {
        "generator_msgs_per_sec": round(gen_n / gen_sec),
        "capture_events_per_sec": round(events_n / times["capture_pipeline"]),
        "baseline_publish_msgs_per_sec": 2000,
    }

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "index_build": index_build,
                "throughput": throughput,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
