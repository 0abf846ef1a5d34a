"""Bloom-prefilter crossover rehearsal (r11): at what index size does the
prefiltered incremental dup-span probe beat the plain one?

tools/dup_span_incr_probe.py measures a toy index (~850k grams) where the
plain broadcast join wins; this probe grows ONLY the index (the batch
stays fixed — the streaming regime: a day's ingest vs years of history)
and measures one batch's scrub wall under both legs per ladder step. The
plain leg's per-batch cost is an O(index) DISTINCT SHUFFLE of the gram
store; the Bloom leg replaces it with an O(index) broadcast-bitmap scan
(no exchange) + an O(fpp·index + hits) shuffle — the crossover arrives
when shuffling the index costs more than scanning it.

The index is built from a synthetic corpus through the REAL gram kernel
and read back from parquet (what a micro-batch actually sees); the batch
carries planted cross-corpus repeats so hit accounting stays exact and
load-bearing at every step.

Usage: python tools/bloom_crossover_probe.py [index_docs ...]
       (default 100_000 300_000 — ~1.1M / 3.4M index grams at 100-token
        docs; each doc contributes ~81 20-grams + the shared passage)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 20
BATCH_DOCS = 1_000


def main(sizes: list[int]) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators.dedup import (
        _positioned_kgram_hashes,
        incremental_dup_span_scrub,
    )
    from pulsar_replay_spark.session import get_spark

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from dup_span_incr_probe import _batch

    spark = get_spark("bloom-crossover-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n_docs in sizes:
        # history: batch-0-style corpus (carries the shared passage), its
        # first-occurrence gram index persisted like the sink would
        corpus = _batch(spark, 0, n_docs).localCheckpoint(eager=True)
        grams = _positioned_kgram_hashes(corpus, K)
        firsts = (
            grams.groupBy("gh")
            .agg(F.min(F.struct("doc_id", "pos")).alias("f"))
            .select("gh", F.col("f.doc_id").alias("doc_id"), F.col("f.pos").alias("pos"))
        )
        store = tempfile.mkdtemp(prefix="bloom_xl_")
        try:
            firsts.write.mode("overwrite").parquet(store)
            idx = spark.read.parquet(store)
            n_idx = idx.count()
            batch = _batch(spark, 99, BATCH_DOCS).localCheckpoint(eager=True)

            def scrub(bloom_fpp):
                t0 = time.perf_counter()
                scrubbed, _ = incremental_dup_span_scrub(
                    batch, idx, K, bloom_fpp=bloom_fpp
                )
                hit = scrubbed.filter(
                    F.col("n_kept_tokens") < F.col("n_tokens")
                ).count()
                return round(time.perf_counter() - t0, 2), hit

            # interleave (plain, bloom, plain, bloom) and keep mins so JVM
            # warm-up doesn't bias the first leg
            walls = {"plain": [], "bloom": []}
            hits = set()
            for _ in range(2):
                w, h = scrub(None)
                walls["plain"].append(w)
                hits.add(h)
                w, h = scrub(0.01)
                walls["bloom"].append(w)
                hits.add(h)
            assert len(hits) == 1, hits  # both legs, both reps: same scrub
            # every 5th batch doc carries the passage admitted by the corpus
            assert hits == {BATCH_DOCS // 5}, hits
            row = {
                "index_docs": n_docs,
                "index_grams": int(n_idx),
                "plain_sec_min": min(walls["plain"]),
                "bloom_sec_min": min(walls["bloom"]),
                "plain_reps": walls["plain"],
                "bloom_reps": walls["bloom"],
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(store, ignore_errors=True)
    print(json.dumps({"probe": "bloom_crossover", "k": K, "results": results}))


if __name__ == "__main__":
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 300_000]
    main(sizes)
