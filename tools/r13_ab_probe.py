"""r13 interleaved A/B probes — same-session, alternating arms, MIN-of-reps
(the contention-robust statistic on this host; see
OPTIMIZATION_r13.md "Measurement discipline").

Usage: python tools/r13_ab_probe.py <probe> [reps]
Probes: dupspan | pagerank | wordpiece | pqserve | anchor
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def anchor(spark) -> float:
    import numpy as np

    m = np.random.default_rng(0).standard_normal((1024, 1024))
    s = []
    for _ in range(3):
        t0 = time.perf_counter()
        (m @ m).sum()
        s.append(time.perf_counter() - t0)
    return statistics.median(s) / 0.0405


def interleave(spark, arms: dict, reps: int = 4) -> None:
    """Alternate the arms reps times; report per-arm min/median and the
    bracket anchors."""
    a0 = anchor(spark)
    samples: dict[str, list] = {k: [] for k in arms}
    for r in range(reps):
        for name, thunk in arms.items():
            spark.sparkContext.setJobDescription(f"ab:{name}#{r}")
            t0 = time.perf_counter()
            thunk()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    a1 = anchor(spark)
    print(f"anchors: start {a0:.2f}x end {a1:.2f}x (idle=1, contended>2)")
    for name, ss in samples.items():
        print(
            f"  {name:42s} min {min(ss):7.3f}  med {statistics.median(ss):7.3f}"
            f"  all {[round(x, 2) for x in ss]}"
        )


def main() -> None:
    probe = sys.argv[1] if len(sys.argv) > 1 else "anchor"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pulsar_replay_spark.session import get_spark

    spark = get_spark("r13-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if probe == "anchor":
        print(f"anchor {anchor(spark):.2f}x")
        return

    if probe == "dupspan":
        from pulsar_replay_spark.operators import dedup

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        interleave(
            spark,
            {
                "dup_span md5 (double subtree)": lambda: noop(
                    dedup.dup_span_scrub(docs, min_tokens=10, impl="md5")
                ),
                "dup_span rolling+ckpt (r13 single pass)": lambda: noop(
                    dedup.dup_span_scrub(docs, min_tokens=10, impl="rolling")
                ),
            },
            reps,
        )
        return

    if probe == "pagerank":
        from pulsar_replay_spark.operators import graph
        from pulsar_replay_spark.queries_relational import pagerank_trade_adaptive

        def with_gate(n):
            def run():
                old = graph.PR_BROADCAST_MAX_NODES
                graph.PR_BROADCAST_MAX_NODES = n
                try:
                    noop(pagerank_trade_adaptive(spark, SF))
                finally:
                    graph.PR_BROADCAST_MAX_NODES = old

            return run

        interleave(
            spark,
            {
                "pagerank SMJ ranks (r12, gate=0)": with_gate(0),
                "pagerank broadcast ranks (r13)": with_gate(2_000_000),
            },
            reps,
        )
        return

    if probe == "wordpiece":
        from pyspark.sql import functions as F

        from pulsar_replay_spark.operators import bpe, wordpiece
        from pulsar_replay_spark.operators.bpe import _merge_fold
        from pulsar_replay_spark.operators.wordpiece import _SCORE_EPS

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        wf = bpe.word_freqs(docs).localCheckpoint(eager=True)

        def r12_train(n_merges=20, min_pair_freq=2, ckpt_every=2):
            # the VERBATIM r12 round: two vocab scans (pair agg + symbol
            # agg), broadcast-join scoring, float top-K + Fraction recheck
            from fractions import Fraction

            vocab = wf.select(
                "word", "freq", F.split("word", "").alias("syms")
            ).localCheckpoint(eager=True)
            merges, pending = [], 0
            for _ in range(n_merges):
                pairs = (
                    vocab.select(
                        "freq",
                        F.explode(
                            F.when(
                                F.size("syms") >= 2,
                                F.transform(
                                    F.sequence(F.lit(0), F.size("syms") - 2),
                                    lambda i: F.struct(
                                        F.element_at(F.col("syms"), i + 1).alias("a"),
                                        F.element_at(F.col("syms"), i + 2).alias("b"),
                                    ),
                                ),
                            ).otherwise(
                                F.array().cast("array<struct<a:string,b:string>>")
                            )
                        ).alias("p"),
                    )
                    .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                    .agg(F.sum("freq").alias("cnt"))
                    .filter(F.col("cnt") >= min_pair_freq)
                )
                symc = (
                    vocab.select("freq", F.explode("syms").alias("s"))
                    .groupBy("s")
                    .agg(F.sum("freq").cast("decimal(19,0)").alias("scnt"))
                )
                sa = symc.select(F.col("s").alias("a"), F.col("scnt").alias("scnt_a"))
                sb = symc.select(F.col("s").alias("b"), F.col("scnt").alias("scnt_b"))
                scored = (
                    pairs.join(F.broadcast(sa), "a")
                    .join(F.broadcast(sb), "b")
                    .select(
                        "a", "b", "cnt",
                        (F.col("scnt_a") * F.col("scnt_b")).alias("den"),
                        (
                            F.col("cnt").cast("double")
                            / (F.col("scnt_a") * F.col("scnt_b")).cast("double")
                        ).alias("score"),
                    )
                )
                top = scored.orderBy(
                    F.desc("score"), F.desc("cnt"), "a", "b"
                ).limit(128).collect()
                if not top:
                    break
                m = top[0]["score"]
                cands = [r for r in top if r["score"] >= m * (1 - _SCORE_EPS)]
                best, best_key = None, None
                for r in cands:
                    key = (Fraction(int(r["cnt"]), int(r["den"])), int(r["cnt"]))
                    p = (r["a"], r["b"])
                    if best is None or key > best_key or (key == best_key and p < best):
                        best, best_key = p, key
                if best is None:
                    break
                a, b = best
                merges.append((a, b))
                vocab = vocab.withColumn("syms", _merge_fold(F.col("syms"), a, b))
                pending += 1
                if pending >= ckpt_every:
                    vocab = vocab.localCheckpoint(eager=True)
                    pending = 0
            return merges

        new = wordpiece.wordpiece_train(wf, 20)
        old = r12_train(20)
        print("merge lists equal:", new == old)
        interleave(
            spark,
            {
                "wordpiece r12 shape (two-leg rounds)": lambda: r12_train(20),
                "wordpiece r13 (inventory collect)": (
                    lambda: wordpiece.wordpiece_train(wf, 20)
                ),
            },
            reps,
        )
        return

    if probe == "pqserve":
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from pulsar_replay_spark.operators import vecstore

        emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        vq = (
            emb.filter(F.col("vec_id") % 200 == 0).localCheckpoint(eager=True)
        )
        pq_dir = tempfile.mkdtemp(prefix="ivf_pq_ab_")
        try:
            vecstore.ivf_index_build(emb, pq_dir, pq=True)
            interleave(
                spark,
                {
                    "ivf_pq_topk_from_store": lambda: noop(
                        vecstore.ivf_pq_topk_from_index(
                            spark, pq_dir, vq, k=10, n_probe=8
                        )
                    ),
                },
                reps,
            )
        finally:
            shutil.rmtree(pq_dir, ignore_errors=True)
        return

    raise SystemExit(f"unknown probe {probe!r}")


if __name__ == "__main__":
    main()
