"""r9 scale rehearsals: span-level decontamination + Unicode repair.

Replicates the sf0.01 documents corpus N× (distinct doc_ids; a fraction of
replicas planted with (a) an eval-suite quote for the span scrub and (b)
cp1252 mojibake for the repair pass) and measures wall time + hit
accounting at 10/20/30 replicas. Linear-ish growth is the expectation:
both operators are per-doc — span scrub's only shuffle is the
contamination-bounded hit aggregate + the doc_id re-join, and the repair
is a shuffle-free Arrow scan.

Usage: python tools/r9_probe.py [replicas ...]   (default: 10 20 30)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.01"
QUOTE = "the capital of france is paris since the middle ages period"


def main(replicas: list[int]) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import dedup, textnorm
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("r9-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SRC}/documents.parquet").select("doc_id", "text")
    bench = spark.createDataFrame([(900, QUOTE)], "doc_id long, text string")

    for n in replicas:
        parts = []
        for i in range(n):
            rep = base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                # every 50th doc of replica i>0 gets the quote planted
                # mid-text (span scrub hits) and a mojibake marker pair
                F.when(
                    (F.col("doc_id") % 50 == i % 50) & F.lit(i > 0),
                    F.concat(F.col("text"), F.lit(f" {QUOTE} Ã©tÃ© tail{i}")),
                )
                .otherwise(F.concat(F.col("text"), F.lit(f" tail{i}")))
                .alias("text"),
            )
            parts.append(rep)
        docs = parts[0]
        for p in parts[1:]:
            docs = docs.unionByName(p)
        docs = docs.localCheckpoint(eager=True)
        n_docs = docs.count()

        t0 = time.monotonic()
        scrub = dedup.span_decon_scrub(docs, bench)
        n_hit = scrub.filter(F.col("n_kept_tokens") < F.col("n_tokens")).count()
        scrub_sec = time.monotonic() - t0

        t0 = time.monotonic()
        repaired = textnorm.repair_corpus(docs.withColumn("n_chars", F.length("text")))
        n_fixed = (
            repaired.select(
                textnorm.mojibake_marker_count(F.col("text")).alias("m")
            )
            .filter(F.col("m") > 0)
            .count()
        )
        repair_sec = time.monotonic() - t0

        print(
            json.dumps(
                {
                    "replicas": n,
                    "n_docs": n_docs,
                    "span_scrub_sec": round(scrub_sec, 2),
                    "contaminated_docs": n_hit,
                    "repair_sec": round(repair_sec, 2),
                    "residual_marker_docs": n_fixed,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [10, 20, 30])
