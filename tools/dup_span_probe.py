"""Any-length exact-substring dedup scale rehearsal (r10).

Synthesizes a corpus whose duplicated-span tail mimics the real failure
mode — a SMALL set of boilerplate passages (licence block, nav footer,
quoted paragraph) repeated across a large fraction of docs at RANDOM
alignments and VARIABLE lengths — and measures ``dup_span_scrub`` at
N× replicas:

- wall clock (the flat-ish-growth claim: one positioned-k-gram shuffle +
  one bounded per-doc agg, both linear in corpus tokens),
- the duplicated-gram relation size vs total grams (the thin-tail claim
  that lets AQE broadcast the marked-grams join),
- correctness spot checks at every scale: planted later copies lose
  exactly their planted spans; unique docs pass byte-exact.

Usage: python tools/dup_span_probe.py [replicas ...]   (default 10 20 30)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DOCS_PER_REPLICA = 2_000
DOC_TOKENS = 120
K = 20  # min_tokens — the Lee et al. ballpark threshold


def _corpus(spark, n_docs: int):
    """Deterministic synthetic corpus: every doc gets unique filler tokens
    (salted by doc_id, so no accidental cross-doc repeats); docs with
    doc_id % 5 == 1..3 embed one of three shared passages (21, 35, 63
    tokens) at a doc_id-dependent offset — any-alignment repeats a fixed
    window cannot see. doc_id % 5 == 0 carries the passage's FIRST
    occurrence region (lowest ids), the rest are later copies."""
    from pyspark.sql import functions as F

    passages = {
        1: " ".join(f"lic{i}" for i in range(21)),
        2: " ".join(f"nav{i}" for i in range(35)),
        3: " ".join(f"quote{i}" for i in range(63)),
    }
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    filler = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
        lambda i: F.concat_ws("", F.lit("u"), F.col("doc_id"), F.lit("x"), i),
    )
    mode = F.col("doc_id") % 5
    offset = (F.col("doc_id") % 17).cast("int")  # random-ish alignment
    text = F.array_join(filler, " ")
    for m, p in passages.items():
        head = F.array_join(F.slice(filler, 1, offset + 1), " ")
        tail = F.array_join(
            F.slice(filler, offset + 2, DOC_TOKENS), " "
        )
        text = F.when(
            mode == m, F.concat_ws(" ", head, F.lit(p), tail)
        ).otherwise(text)
    return base.select("doc_id", text.alias("text"))


def main(replicas: list[int]) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import dedup
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("dup-span-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for r in replicas:
        n = r * DOCS_PER_REPLICA
        docs = _corpus(spark, n).localCheckpoint(eager=True)

        grams = dedup._positioned_kgram_hashes(docs, K)
        total_grams = grams.count()
        dup_grams = (
            grams.groupBy("gh").count().filter(F.col("count") > 1).count()
        )

        def timed_scrub(impl: str):
            t0 = time.perf_counter()
            out = dedup.dup_span_scrub(docs, min_tokens=K, impl=impl)
            stats = out.agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tok"),
                F.sum("n_kept_tokens").alias("n_kept"),
                F.sum(
                    (F.col("n_kept_tokens") < F.col("n_tokens")).cast("long")
                ).alias("n_scrubbed_docs"),
            ).collect()[0]
            return out, stats, round(time.perf_counter() - t0, 2)

        out, stats, wall = timed_scrub("md5")
        # r11: the rolling-hash fast path (O(1)/position vs O(k) string
        # building, run twice) — same corpus, same aggregate totals
        # (the bit-identical gate lives in tests; here we pin the probe's
        # end-to-end stats match at every scale), separate wall.
        _, stats_roll, wall_roll = timed_scrub("rolling")
        assert tuple(stats) == tuple(stats_roll), (tuple(stats), tuple(stats_roll))

        # correctness spot check: a later copy of each passage lost EXACTLY
        # its passage length; a mode-4 doc passed byte-exact
        sample = {
            row.doc_id: row
            for row in out.filter(
                F.col("doc_id").isin(6, 7, 8, 4)  # modes 1,2,3 later; 4 clean
            ).collect()
        }
        plen = {6: 21, 7: 35, 8: 63}
        for d, want in plen.items():
            lost = sample[d].n_tokens - sample[d].n_kept_tokens
            assert lost == want, (d, lost, want)
        assert sample[4].n_kept_tokens == sample[4].n_tokens

        results.append(
            {
                "replicas": r,
                "n_docs": int(stats.n_docs),
                "total_grams": int(total_grams),
                "dup_grams": int(dup_grams),
                "dup_gram_ratio": round(dup_grams / max(total_grams, 1), 5),
                "scrubbed_docs": int(stats.n_scrubbed_docs),
                "tokens_removed": int(stats.n_tok - stats.n_kept),
                "scrub_wall_sec": wall,
                "scrub_wall_sec_rolling": wall_roll,
            }
        )
        print(json.dumps(results[-1]))
    print(json.dumps({"probe": "dup_span", "k": K, "results": results}))


if __name__ == "__main__":
    reps = [int(a) for a in sys.argv[1:]] or [10, 20, 30]
    main(reps)
