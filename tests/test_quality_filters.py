"""Repetition-signal and decontamination tests: planted cases + the plan
shapes that matter at corpus scale (shuffle-free signal pass, broadcast
benchmark probe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_replay_spark.operators.dedup import benchmark_overlap
from pulsar_replay_spark.operators.quality import repetition_signals


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_signals_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam", "s"),
            (2, "alpha beta gamma delta epsilon zeta", "s"),
            (3, "solo", "s"),
        ],
        "doc_id int, text string, source string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    # 6x the same token: 1 distinct of 6 tokens, 1 distinct of 5 bigrams
    assert rows[1]["dup_token_ratio"] == round(1 - 1 / 6, 4)
    assert rows[1]["dup_bigram_ratio"] == round(1 - 1 / 5, 4)
    assert rows[1]["top_token_ratio"] == 1.0
    # all-distinct doc: zero repetition, top token is 1 of 6
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[2]["dup_bigram_ratio"] == 0.0
    assert rows[2]["top_token_ratio"] == round(1 / 6, 4)
    # single-token doc has no bigrams -> null, not divide-by-zero
    assert rows[3]["dup_bigram_ratio"] is None
    assert rows[3]["n_tokens"] == 1


def test_repetition_signals_shuffle_free(spark, documents):
    plan = _plan(repetition_signals(documents))
    assert "Exchange" not in plan, plan[:2000]


def test_benchmark_overlap_planted(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words entirely unrelated tokens here"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in benchmark_overlap(corpus, bench, min_overlap=3).collect()
    }
    # doc 1 embeds the 9-token benchmark text: shares its 6 interior shingles
    assert out[1]["n_overlap"] == 6
    assert out[1]["contaminated"]
    # clean doc is still reported, with zero overlap
    assert out[2]["n_overlap"] == 0
    assert not out[2]["contaminated"]


def test_benchmark_overlap_broadcasts_bench_side(spark, documents):
    bench = documents.filter(F.col("doc_id") % 20 == 0)
    corpus = documents.filter(F.col("doc_id") % 20 != 0)
    plan = _plan(benchmark_overlap(corpus, bench))
    # the shingle probe against the benchmark set must be a broadcast join —
    # the corpus side is never shuffled for the probe
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
