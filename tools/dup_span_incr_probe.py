"""Incremental dup-span store growth rehearsal (r10).

The one-shot probe (dup_span_probe.py) shows the operator flat; this one
measures the SERVING side the streaming sink lives on: per-batch scrub
wall as the gram index grows batch over batch, then the same probe against
the compacted store. The honest expectation: per-batch cost carries an
O(index) term (the probe equi-join scans the store — there is no
query-bounded pruning here because a batch's gram set is corpus-like, not
vocabulary-like), PLUS a file-count term the per-batch appends inflate and
compaction removes. The numbers tell operators when to compact and when to
front the Bloom prefilter.

Usage: python tools/dup_span_incr_probe.py [n_batches docs_per_batch]
       (default 10 1000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DOC_TOKENS = 100
K = 20


def _batch(spark, batch_id: int, n_docs: int):
    """Fresh unique filler per doc; 20% of docs embed a passage first seen
    in batch 0 (the cross-batch repeat the index exists to catch)."""
    from pyspark.sql import functions as F

    passage = " ".join(f"shared{i}" for i in range(30))
    base = spark.range(n_docs).select(
        (F.col("id") + batch_id * 1_000_000).alias("doc_id")
    )
    filler = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
        lambda i: F.concat_ws("", F.lit("u"), F.col("doc_id"), F.lit("x"), i),
    )
    text = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat_ws(" ", F.array_join(F.slice(filler, 1, 40), " "),
                    F.lit(passage),
                    F.array_join(F.slice(filler, 41, DOC_TOKENS), " ")),
    ).otherwise(F.array_join(filler, " "))
    return base.select("doc_id", text.alias("text"))


def main(n_batches: int, docs_per_batch: int) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators.dedup import incremental_dup_span_scrub
    from pulsar_replay_spark.session import get_spark
    from pulsar_replay_spark.streaming.pipelines import dup_span_store_compact

    spark = get_spark("dup-span-incr-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="dup_span_store_")
    compacted = tempfile.mkdtemp(prefix="dup_span_compact_") + "/c"
    results = []
    try:
        wrote_any = False
        for b in range(n_batches):
            batch = _batch(spark, b, docs_per_batch).localCheckpoint(eager=True)
            idx = (
                spark.read.parquet(store).select("gh", "doc_id", "pos")
                if wrote_any
                else spark.createDataFrame([], "gh string, doc_id long, pos int")
            )
            t0 = time.perf_counter()
            scrubbed, new_grams = incremental_dup_span_scrub(batch, idx, K)
            stats = scrubbed.agg(
                F.sum((F.col("n_kept_tokens") < F.col("n_tokens")).cast("long")
                      ).alias("scrubbed_docs")
            ).collect()[0]
            wall = round(time.perf_counter() - t0, 2)

            # r11: the Bloom-prefiltered leg — same scrub answer, and the
            # probe join's index-side input measured as a FRACTION of the
            # index (the selectivity the prefilter buys; false positives
            # only add candidates, so correctness is by construction).
            t0 = time.perf_counter()
            scrubbed_bl, _ = incremental_dup_span_scrub(
                batch, idx, K, bloom_fpp=0.01
            )
            stats_bl = scrubbed_bl.agg(
                F.sum((F.col("n_kept_tokens") < F.col("n_tokens")).cast("long")
                      ).alias("scrubbed_docs")
            ).collect()[0]
            wall_bloom = round(time.perf_counter() - t0, 2)
            assert int(stats_bl.scrubbed_docs) == int(stats.scrubbed_docs)
            selectivity = None
            if wrote_any:
                from pulsar_replay_spark.operators.bloom import (
                    bloom_build,
                    bloom_might_contain,
                    bloom_params,
                )
                from pulsar_replay_spark.operators.dedup import (
                    _positioned_kgram_hashes,
                )

                bg = (
                    _positioned_kgram_hashes(batch, K)
                    .select("gh")
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                n_bits, n_hashes = bloom_params(max(1, bg.count()), 0.01)
                bm = bloom_build(bg, "gh", n_bits, n_hashes, key_kind="hex128")
                idx_n = idx.count()
                cand_n = (
                    bloom_might_contain(
                        idx.select("gh"), "gh", bm, n_hashes, key_kind="hex128"
                    )
                    .filter(F.col("might_contain"))
                    .count()
                )
                selectivity = round(cand_n / max(1, idx_n), 5)

            new_grams.withColumn("batch_id", F.lit(b)).write.mode(
                "append"
            ).partitionBy("batch_id").parquet(store)
            wrote_any = True
            # batch 0's first passage carrier admits it and the other
            # carriers dedup WITHIN the batch; every later batch's 20%
            # carriers scrub against the index
            want = docs_per_batch // 5 - (1 if b == 0 else 0)
            got = int(stats.scrubbed_docs)
            assert got == want, (b, got, want)
            results.append({"batch": b, "scrub_wall_sec": wall,
                            "scrub_wall_sec_bloom": wall_bloom,
                            "index_probe_selectivity": selectivity,
                            "scrubbed_docs": got})
            print(json.dumps(results[-1]))

        # compacted-store probe: same final batch against base-partition-only
        probe = _batch(spark, n_batches, docs_per_batch).localCheckpoint(
            eager=True
        )
        grown_idx = spark.read.parquet(store).select("gh", "doc_id", "pos")
        t0 = time.perf_counter()
        s1, _ = incremental_dup_span_scrub(probe, grown_idx, K)
        s1.count()
        grown_wall = round(time.perf_counter() - t0, 2)
        dup_span_store_compact(spark, store, compacted)
        cidx = spark.read.parquet(compacted).select("gh", "doc_id", "pos")
        t0 = time.perf_counter()
        s2, _ = incremental_dup_span_scrub(probe, cidx, K)
        s2.count()
        compact_wall = round(time.perf_counter() - t0, 2)
        summary = {
            "probe": "dup_span_incr",
            "k": K,
            "per_batch": results,
            "final_probe_grown_sec": grown_wall,
            "final_probe_compacted_sec": compact_wall,
            "index_rows": int(cidx.count()),
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(str(Path(compacted).parent), ignore_errors=True)


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dpb = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(nb, dpb)
