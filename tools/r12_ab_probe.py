"""r12 optimization A/B probes at sf0.1 — targeted per-change timings
(median of 3 noop-sink reps) so each edit's effect is attributable
independently of the full bench. Usage: python tools/r12_ab_probe.py [exp ...]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def timed(name, thunk, reps=3):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        thunk()
        samples.append(time.perf_counter() - t0)
    print(
        f"{name:48s} med {statistics.median(samples):7.3f} "
        f"[{min(samples):7.3f},{max(samples):7.3f}]"
    )
    return statistics.median(samples)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    wanted = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from pulsar_replay_spark.session import get_spark

    spark = get_spark("r12-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def want(x):
        return not wanted or x in wanted

    if want("dupspan"):
        from pulsar_replay_spark.operators import dedup
        from pulsar_replay_spark.queries_llm import _planted_clone_docs

        docs = _planted_clone_docs(spark, SF)
        spark.sparkContext.setJobDescription("dup_span_scrub md5")
        timed(
            "dup_span_scrub impl=md5",
            lambda: noop(dedup.dup_span_scrub(docs, min_tokens=10, impl="md5")),
        )
        spark.sparkContext.setJobDescription("dup_span_scrub rolling")
        timed(
            "dup_span_scrub impl=rolling",
            lambda: noop(dedup.dup_span_scrub(docs, min_tokens=10, impl="rolling")),
        )
        spark.sparkContext.setJobDescription(None)

    if want("toptoken"):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        text = F.col("text")

        def quad_top(text):
            def inner(t):
                return F.array_max(
                    F.transform(
                        F.array_distinct(t),
                        lambda x: F.size(F.filter(t, lambda y: y == x)),
                    )
                )

            return F.transform(F.array(F.split(text, " ")), inner)[0]

        from pulsar_replay_spark.functions.text import top_token_count

        # r13 (ADVICE): the r12 experiment REJECTED the array_sort+run-length
        # rewrite, so top_token_count kept the quadratic form — the second
        # arm is the rejected variant INLINED here so the A/B still measures
        # something (shipped-vs-rejected, not shipped-vs-itself).
        def sortrun_top(text):
            def inner(t):
                srt = F.array_sort(t)
                runs = F.filter(
                    F.transform(
                        srt,
                        lambda x, i: F.when(
                            (i == 0) | (x != F.element_at(srt, i)), i
                        ),
                    ),
                    lambda v: v.isNotNull(),
                )
                ends = F.concat(
                    F.slice(runs, 2, F.greatest(F.size(runs) - 1, F.lit(0))),
                    F.array(F.size(srt)),
                )
                return F.array_max(
                    F.zip_with(ends, runs, lambda e, s: e - s)
                )

            return F.transform(F.array(F.split(text, " ")), inner)[0]

        timed(
            "top_token_count quadratic (shipped)",
            lambda: noop(docs.select(top_token_count(text).alias("c"))),
        )
        timed(
            "top_token_count sort+run (rejected r12)",
            lambda: noop(docs.select(sortrun_top(text).alias("c"))),
        )
        # value equality, full corpus
        n_diff = (
            docs.select(
                quad_top(text).alias("a"), sortrun_top(text).alias("b")
            )
            .filter("a <> b")
            .count()
        )
        print(f"top_token_count equality: {n_diff} differing rows")

    if want("profile"):
        import __spark_entry__ as m

        qs = m.queries()
        timed("doc_profile (current code)", lambda: noop(qs["doc_profile"](spark, SF)))

    if want("gapfill"):
        from pulsar_replay_spark.queries_temporal import q_gapfill_hourly_counts
        from pulsar_replay_spark.session import load_events

        def old_gapfill():
            ev = load_events(spark, SF)
            bounds = ev.groupBy("user_id").agg(
                F.date_trunc("hour", F.min("ts")).alias("h0"),
                F.date_trunc("hour", F.max("ts")).alias("h1"),
            )
            grid = bounds.select(
                "user_id",
                F.explode(
                    F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
                ).alias("h"),
            )
            cnt = ev.groupBy(
                "user_id", F.date_trunc("hour", "ts").alias("h")
            ).agg(F.count("*").alias("n"))
            return grid.join(cnt, ["user_id", "h"], "left").select(
                "user_id",
                F.unix_millis("h").alias("hour_ms"),
                F.coalesce("n", F.lit(0)).alias("n"),
            )

        timed("gapfill old (2 events scans)", lambda: noop(old_gapfill()))
        timed(
            "gapfill new (1 scan + ckpt)",
            lambda: noop(q_gapfill_hourly_counts(spark, SF)),
        )
        import __spark_entry__ as m

        qs = m.queries()
        timed(
            "time_bucketed_counts (current code)",
            lambda: noop(qs["time_bucketed_counts"](spark, SF)),
        )

    if want("pagerank"):
        import __spark_entry__ as m

        qs = m.queries()
        timed(
            "pagerank_trade_adaptive (current code)",
            lambda: noop(qs["pagerank_trade_adaptive"](spark, SF)),
        )

    if want("shj"):
        from pulsar_replay_spark.operators import bpe, curation, unigram

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        target = docs.filter(F.col("lang") == "es")
        ratio, default = curation.dsir_bucket_log_ratio(
            curation.dsir_features(target), curation.dsir_features(docs)
        )
        wf = bpe.word_freqs(docs).localCheckpoint(eager=True)
        um = unigram.unigram_train(wf, vocab_size=200, n_iters=2)
        for thr in ("0", "128m"):
            spark.conf.set(
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", thr
            )
            timed(
                f"dsir_score thr={thr}",
                lambda: noop(curation.dsir_score(docs, ratio, default)),
            )
            timed(
                f"unigram_token_counts thr={thr}",
                lambda: noop(unigram.unigram_token_counts(docs, um)),
            )


if __name__ == "__main__":
    main()
